package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator: keeps the k best
  * (score desc, id asc) pairs per group with map-side combine, so
  * each map task contributes AT MOST k rows per group to the shuffle
  * and nothing is ever globally sorted — the shape that beats both a
  * single `row_number` window (whole group sorted on one task) and
  * the two-phase salted window (one full sort of the data in the
  * local phase) for low-cardinality group top-k at scale.
  *
  * The buffer is a plain array amortized to stay small: elements
  * append until 4·k, then one local sort truncates back to k —
  * O(n log k) amortized per partition, encoder-friendly (no heap
  * structure to serialize). Determinism: the final order and the
  * survivor set depend only on the (score, id) multiset, not on
  * partitioning or encounter order, because truncation always keeps
  * the global best k of what it has seen.
  */
case class TopKBuffer(var scores: Array[Double], var ids: Array[Long],
                      var n: Int)

class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuffer,
    Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private val cap = math.max(4 * k, 16)

  override def zero: TopKBuffer =
    TopKBuffer(new Array[Double](0), new Array[Long](0), 0)

  /** (score desc, id asc) — matches the rankTopK/window convention. */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def truncate(b: TopKBuffer): TopKBuffer = {
    if (b.n <= k) return b
    val idx = (0 until b.n).sortWith((x, y) =>
      better(b.scores(x), b.ids(x), b.scores(y), b.ids(y))).take(k)
    val ns = new Array[Double](k); val ni = new Array[Long](k)
    var j = 0
    idx.foreach { i => ns(j) = b.scores(i); ni(j) = b.ids(i); j += 1 }
    b.scores = ns; b.ids = ni; b.n = k
    b
  }

  private def append(b: TopKBuffer, s: Double, id: Long): TopKBuffer = {
    if (b.scores.length == b.n) {
      val grow = math.max(cap, b.n * 2)
      b.scores = java.util.Arrays.copyOf(b.scores, grow)
      b.ids = java.util.Arrays.copyOf(b.ids, grow)
    }
    b.scores(b.n) = s; b.ids(b.n) = id; b.n += 1
    if (b.n >= cap) truncate(b) else b
  }

  override def reduce(b: TopKBuffer, in: (Double, Long)): TopKBuffer =
    append(b, in._1, in._2)

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    var acc = a
    while (i < b.n) { acc = append(acc, b.scores(i), b.ids(i)); i += 1 }
    acc
  }

  override def finish(b: TopKBuffer): Seq[(Double, Long)] = {
    val t = truncate(b)
    (0 until t.n).map(i => (t.scores(i), t.ids(i)))
      .sortWith((x, y) => better(x._1, x._2, y._1, y._2))
  }

  override def bufferEncoder: Encoder[TopKBuffer] =
    Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
