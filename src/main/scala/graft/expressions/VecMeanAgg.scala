package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of grouped float vectors as a typed Aggregator
  * (SURVEY.md §4: the A2 mean-pool custom-Aggregator option). The
  * posexplode formulation shuffles dim× narrow rows per input vector —
  * fine for small dims, but at 768-d it multiplies the shuffle volume
  * by the dimension. This Aggregator keeps one (sums[dim], count)
  * partial per group per partition: map-side combine collapses each
  * partition's vectors locally and the shuffle carries one buffer per
  * (group × partition).
  *
  * Null and empty vectors are skipped (not counted). Ragged lengths are
  * handled deterministically regardless of partition/encounter order:
  * the buffer grows to the longest length seen and shorter vectors are
  * zero-padded — though validity filtering (`Vectors.isValid`) belongs
  * upstream for meaningful means.
  */
case class VecMeanBuffer(var sums: Array[Double], var n: Long)

class VecMeanAgg extends Aggregator[Seq[Float], VecMeanBuffer, Seq[Double]] {

  override def zero: VecMeanBuffer = VecMeanBuffer(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuffer, v: Seq[Float]): VecMeanBuffer = {
    if (v == null || v.isEmpty) return b
    if (v.length > b.sums.length)
      b.sums = java.util.Arrays.copyOf(b.sums, v.length)
    var i = 0
    while (i < v.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: VecMeanBuffer, b: VecMeanBuffer): VecMeanBuffer = {
    if (b.sums.length > a.sums.length)
      a.sums = java.util.Arrays.copyOf(a.sums, b.sums.length)
    var i = 0
    while (i < b.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    a.n += b.n
    a
  }

  override def finish(r: VecMeanBuffer): Seq[Double] =
    if (r.n == 0L) Seq.empty
    else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuffer] =
    Encoders.product[VecMeanBuffer]
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
