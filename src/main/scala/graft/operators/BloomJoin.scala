package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-pruned semi join — the manual form of Spark's row-level
  * runtime filter (InjectRuntimeFilter), for when the build side is
  * only known to be small AFTER its filter (so AQE/static planning
  * won't inject one). At 100 TB the difference is shuffling the whole
  * probe table versus shipping a megabyte-scale bitset: the bloom
  * pre-filter drops ~(1 − fpp) of non-matching probe rows AT THE SCAN,
  * before any exchange, and the exact semi join afterwards removes the
  * false positives — the result is provably identical to the plain
  * semi join (q99's oracle states exactly that).
  *
  * Mechanics: the build side aggregates `xxhash64(key)` into Spark's
  * native [[BloomFilterAggregate]] (a map-side-combined
  * TypedImperativeAggregate — ONE pass, partial sketches merged), the
  * serialized bitset returns to the driver (bounded by `numBits/8`
  * bytes regardless of build cardinality — same sanctioned shape as
  * the IVF training sample, and what Spark's own runtime filter does
  * with its scalar subquery), and rides into the probe scan as a
  * foldable literal inside codegen'd [[BloomFilterMightContain]].
  */
object BloomJoin {

  /** Serialized bloom bitset over `xxhash64(build.buildKey)`. */
  def buildBloom(build: DataFrame, buildKey: String,
                 expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(buildKey))), expectedItems)
      .toAggregateExpression()
    build.select(ColumnBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** The bloom membership test as a standalone scan predicate:
    * `might_contain(bloom, xxhash64(key))` over a [[buildBloom]]
    * bitset riding as a foldable literal — codegen'd, evaluated at
    * the scan before any exchange. False positives pass (callers
    * follow with an exact join); false negatives cannot occur.
    */
  def mightContain(bloom: Array[Byte], key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(lit(bloom)),
      ColumnBridge.expression(xxhash64(key))))

  /** Rows of `probe` whose `probeKey` has a match in `build.buildKey` —
    * ≡ `probe.join(build, probe(probeKey) === build(buildKey),
    * "left_semi")`, with the bloom pre-filter pruning the probe scan
    * first.
    */
  def bloomSemiJoin(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(build, buildKey, expectedItems)
    probe.filter(mightContain(bloom, col(probeKey)))
      .join(build.select(col(buildKey).as(probeKey)),
        Seq(probeKey), "left_semi")
  }
}
