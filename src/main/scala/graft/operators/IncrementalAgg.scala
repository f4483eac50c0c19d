package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Incremental materialized-aggregate maintenance (additive IVM): a
  * standing rollup of per-key counts and sums is refreshed from
  * append-only deltas by aggregating ONLY the delta and re-aggregating
  * it with the (key-cardinality-sized) rollup — the dashboard-refresh
  * pattern that never rescans the corpus. At 100 TB the corpus scan is
  * the thing you cannot afford per refresh; this touches delta +
  * rollup rows only.
  *
  * Exactly-once: each delta carries a caller-assigned `batchId`. The
  * applied-batch list travels INSIDE the table directory
  * (`_graft_batches`) and is REWRITTEN AS PART OF the same
  * tmp→swap rename that installs the refreshed data — so data and
  * batch list commit atomically (the `Upsert.__old` protocol), there
  * is no crash window between them, and an at-least-once caller
  * (foreachBatch retries, job re-runs) gets exactly-once rollups:
  * a replayed batchId is a no-op. Spec-pinned: incremental ≡ full
  * recompute, replay-idempotent.
  */
object IncrementalAgg {

  private val BatchesFile = "_graft_batches"

  /** Batch ids already folded into the rollup at `path`. On entry, a
    * crash between the previous refresh's swap renames (rollup dir
    * missing, `__old` backup present) is repaired by restoring the
    * backup — otherwise this would answer "no batches applied" and the
    * next refresh would silently drop the entire prior rollup and its
    * batch provenance ([[Staging.restoreIfCrashed]]).
    */
  def appliedBatches(spark: SparkSession, path: String): Seq[String] = {
    val fs = Staging.fsOf(spark, path)
    Staging.restoreIfCrashed(fs, path)
    val f = new Path(path, BatchesFile)
    if (!fs.exists(f)) Nil
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** Fold `delta` into the additive rollup at `path` (schema: keys +
    * `n_rows` + `sum_<c>` per sum column), exactly once per `batchId`.
    * Returns false (no-op) if the batch was already applied.
    */
  def refreshAdditive(spark: SparkSession, path: String, delta: DataFrame,
                      keys: Seq[String], sumCols: Seq[String],
                      batchId: String): Boolean = {
    require(!batchId.contains("\n"), "batchId must be single-line")
    val fs = Staging.fsOf(spark, path)
    val applied = appliedBatches(spark, path) // restores a crashed swap
    Staging.vacuum(spark, path)

    if (applied.contains(batchId)) return false
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c)).as(s"sum_$c"))
    val dAgg = delta.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val target = new Path(path)
    val merged =
      if (!fs.exists(target)) dAgg
      else {
        // re-aggregate rollup ∪ delta-rollup: both are key-cardinality
        // sized — the corpus is never touched
        val reAggs = sum(col("n_rows")).as("n_rows") +:
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
        spark.read.parquet(path).unionByName(dAgg)
          .groupBy(keys.map(col): _*).agg(reAggs.head, reAggs.tail: _*)
      }
    val tmp = new Path(path + "__tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // the batch list rides in the SAME directory the rename installs:
    // data + provenance commit in one atomic step
    val out = fs.create(new Path(tmp, BatchesFile), true)
    try out.write((applied :+ batchId).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val bak = new Path(path + "__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target)) {
      if (!fs.rename(target, bak))
        sys.error(s"refreshAdditive: cannot stage $path")
    }
    if (!fs.rename(tmp, target)) {
      fs.rename(bak, target)
      sys.error(s"refreshAdditive: cannot swap in $tmp")
    }
    if (fs.exists(bak)) fs.delete(bak, true)
    true
  }
}
