package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch distinct counting (Apache DataSketches HLL, built
  * into Spark 4 as `hll_sketch_agg`/`hll_union_agg`): the incremental
  * pattern for COUNT(DISTINCT) at 100 TB. Raw rows are scanned ONCE
  * per ingest slice to build a tiny sketch per (group, slice); any
  * later rollup — different group combination, different time window
  * — merges sketch BYTES instead of rescanning rows. Merging is
  * associative and deterministic, so slice sketches compose to exactly
  * the sketch a whole-corpus scan would build (spec-pinned).
  *
  * vs exact `countDistinct`: exact needs a shuffle of every distinct
  * value per query; sketches pay ~(2^lgK)·groups bytes once, then
  * every query is a metadata-sized merge. Estimate error ~1.04/√2^lgK
  * (≈1.6% at lgK=12).
  */
object Sketches {

  /** One HLL sketch per group: the build pass. `lgK` trades sketch
    * size (2^lgK bytes-ish) for accuracy. Output: groupCols + `sketch`
    * (binary).
    */
  def sketchTable(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll sketches up to a coarser grouping and estimate the distinct
    * count — reads sketch bytes only, never the raw rows.
    */
  def mergeEstimate(sketches: DataFrame, byCols: Seq[String]): DataFrame =
    sketches.groupBy(byCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(false))).as("distinct_est"))

  /** Global estimate over every sketch row (no grouping). */
  def estimateAll(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(
      hll_union_agg(col("sketch"), lit(false))).as("distinct_est"))

  /** Count-min sketch per group — HLL's frequency twin: point
    * FREQUENCY estimates (heavy hitters, per-term counts) from one
    * scan, mergeable across ingest slices by summing counters. The
    * published guarantee (Cormode & Muthukrishnan, J.Alg 2005):
    * exact ≤ est ≤ exact + ε·N with probability ≥ confidence, N =
    * total items. Build is Spark's native `count_min_sketch`
    * aggregate (map-side-combined); a FIXED seed makes the counter
    * layout — and therefore merges — deterministic across slices and
    * engines' runs. Output: groupCols + `cms` (binary).
    */
  def cmsTable(df: DataFrame, groupCols: Seq[String], valueCol: String,
               eps: Double = 0.0005, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"count_min_sketch($valueCol, ${eps}d, ${confidence}d, " +
        s"$seed)").as("cms"))

  /** Merge slice sketches on the driver and answer point queries —
    * the rollup never rescans rows; the collect is sketch BYTES
    * (depth×width counters, fixed by (eps, confidence), independent
    * of data size — the sanctioned driver artifact, same shape as the
    * IVF training sample).
    */
  def cmsEstimate(sketches: DataFrame, items: Seq[String]): Map[String, Long] = {
    import org.apache.spark.util.sketch.CountMinSketch
    val parts = sketches.select(col("cms")).collect()
      .map(r => CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    val merged = parts.reduce { (a, b) => a.mergeInPlace(b); a }
    items.map(t => t -> merged.estimateCount(t)).toMap
  }
}
