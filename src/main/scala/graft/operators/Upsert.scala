package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Keyed MERGE semantics — the engine's equivalent of the reference's
  * Mongo `update_one({key}, {"$set": rec}, upsert=True)` sink
  * (mongo_io_manager.py:79-104, K2) and its partial `$set` column-patch
  * variant (summarize_utils.py:84-88 et al., K4).
  *
  * Offline parquet has no MERGE, so this is a read-modify-write:
  * one full-outer shuffle join on the key. At cluster scale the same
  * code runs unchanged; bucketing base and delta by the key removes
  * the shuffle entirely (Spark co-locates bucketed joins).
  */
object Upsert {

  private val present = "__graft_present"

  /** MERGE `delta` into `base` on `keys`.
    *
    * - `patch = false` (K2 replace-row): a delta row fully replaces the
    *   base row, including nulling columns the delta leaves null.
    * - `patch = true` (K4 `$set`): per non-key column take
    *   `coalesce(delta, base)` — delta nulls preserve base values,
    *   mirroring a partial `$set` that only names some fields.
    *
    * Columns present only in base survive untouched; columns present
    * only in delta are added (null for unmatched base rows). Idempotent:
    * merging the same delta twice is a no-op (property-tested).
    */
  def merge(base: DataFrame, delta: DataFrame, keys: Seq[String],
            patch: Boolean = false): DataFrame = {
    val d = delta.withColumn(present, lit(true))
    val joined = base.as("b").join(d.as("d"), keys, "full_outer")

    val baseCols  = base.columns.toSeq
    val deltaCols = delta.columns.toSet
    val extraCols = delta.columns.toSeq.filterNot(baseCols.contains)

    val merged = (baseCols ++ extraCols).map {
      case k if keys.contains(k) => col(k)
      case c if deltaCols.contains(c) && baseCols.contains(c) =>
        val pick =
          if (patch) coalesce(col(s"d.$c"), col(s"b.$c"))
          else when(col(s"d.$present"), col(s"d.$c")).otherwise(col(s"b.$c"))
        pick.as(c)
      case c if deltaCols.contains(c) => col(s"d.$c").as(c)
      case c => col(s"b.$c").as(c)
    }
    joined.select(merged: _*)
  }

  /** Table-maintenance form: merge delta into the parquet table at
    * `path` and atomically swap it in (write to a sibling temp dir,
    * then rename). K2/K4 against the engine's storage layout.
    */
  def mergeIntoTable(spark: org.apache.spark.sql.SparkSession,
                     path: String, delta: DataFrame, keys: Seq[String],
                     patch: Boolean = false): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val merged =
      if (fs.exists(target)) merge(spark.read.parquet(path), delta, keys, patch)
      else delta
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target)) fs.rename(target, bak)
    fs.rename(tmp, target)
    if (fs.exists(bak)) fs.delete(bak, true)
  }
}
