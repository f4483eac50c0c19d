package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

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
    *
    * This flat form rewrites the WHOLE table per merge — acceptable for
    * small state tables; for anything large use
    * [[mergeIntoPartitionedTable]], which rewrites only the key-hash
    * partitions the delta touches.
    */
  def mergeIntoTable(spark: SparkSession,
                     path: String, delta: DataFrame, keys: Seq[String],
                     patch: Boolean = false): Unit = {
    val fs = Staging.fsOf(spark, path)
    // a crash between the swap renames must read as "restore the
    // backup", not "no table here — rebuild from the delta alone";
    // stale staging debris beyond the retention horizon is swept
    Staging.restoreIfCrashed(fs, path)
    Staging.vacuum(spark, path)
    val target = new Path(path)
    val merged =
      if (fs.exists(target)) merge(spark.read.parquet(path), delta, keys, patch)
      else delta
    val tmp = new Path(path + "__tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new Path(path + "__old")
    // only a backup STALER than live data (live exists) may be dropped
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(target)) mustRename(fs, target, bak)
    mustRename(fs, tmp, target)
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Key-hash partition layout for merge-pruned tables: rows live in
    * `graft_bucket=<pmod(xxhash64(keys), n)>` directories, so a merge
    * whose delta touches k buckets rewrites k/n of the table instead of
    * all of it. At 100 TB an hourly 20-row column patch must not be a
    * full-table rewrite — this is the write-amplification half of the
    * merge story (the join half is already shuffle-free under
    * bucketing, see BucketingSpec).
    */
  val bucketCol = "graft_bucket"

  /** The stable key→bucket expression shared by writer and merger. */
  def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets)).cast("int")

  private def layoutMarker(path: String) = new Path(path, "_graft_buckets")

  /** Checked rename — see [[Staging.mustRename]]. */
  private def mustRename(fs: FileSystem, src: Path, dst: Path): Unit =
    Staging.mustRename(fs, src, dst)

  /** (Re)write `df` as a key-hash-partitioned table. Records the bucket
    * count in a `_graft_buckets` marker so later merges can't silently
    * use a mismatched layout.
    */
  def writePartitionedTable(df: DataFrame, path: String, keys: Seq[String],
                            numBuckets: Int): Unit = {
    df.withColumn(bucketCol, bucketOf(keys, numBuckets))
      .write.partitionBy(bucketCol).mode(SaveMode.Overwrite).parquet(path)
    val fs = Staging.fsOf(df.sparkSession, path)
    val out = fs.create(layoutMarker(path), true)
    out.write(numBuckets.toString.getBytes("UTF-8"))
    out.close()
  }

  private def readLayout(fs: FileSystem, path: String): Option[Int] = {
    val m = layoutMarker(path)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        // loop the read — a single read() may return fewer bytes than
        // available, and an empty marker returns -1
        val buf = new Array[Byte](64)
        var total = 0
        var n = in.read(buf, total, buf.length - total)
        while (n > 0 && total + n < buf.length) {
          total += n
          n = in.read(buf, total, buf.length - total)
        }
        if (n > 0) total += n
        val s = new String(buf, 0, total, "UTF-8").trim
        val parsed = s.toIntOption.filter(_ > 0)
        if (parsed.isEmpty)
          throw new IllegalStateException(
            s"corrupt _graft_buckets marker at $path: " +
              (if (s.isEmpty) "empty" else s"'$s' is not a positive int"))
        parsed
      } finally in.close()
    }
  }

  /** MERGE `delta` into the key-hash-partitioned table at `path`,
    * rewriting ONLY the bucket directories the delta touches:
    *  1. the delta's distinct bucket ids are collected (≤ numBuckets
    *     ints — bounded regardless of delta size);
    *  2. the base read filters on the partition column, so the scan
    *     prunes to touched directories (PartitionFilters, verified in
    *     UpsertSpec);
    *  3. the merged result is written partitioned to a temp dir and
    *     each touched `graft_bucket=<b>` directory is swapped in;
    *     untouched directories are never read, written, or moved.
    */
  def mergeIntoPartitionedTable(spark: SparkSession, path: String,
                                delta: DataFrame, keys: Seq[String],
                                numBuckets: Int,
                                patch: Boolean = false): Unit = {
    val fs = Staging.fsOf(spark, path)
    // a hard crash mid-swap leaves a bucket only in the backup root —
    // restore it before the layout/bucket reads below
    Staging.restoreBucketsIfCrashed(fs, path, bucketCol)
    Staging.vacuum(spark, path)
    if (!fs.exists(new Path(path))) {
      writePartitionedTable(delta, path, keys, numBuckets)
      return
    }
    readLayout(fs, path).foreach { n =>
      require(n == numBuckets,
        s"table at $path is laid out with $n buckets, merge called with $numBuckets")
    }
    val touched = delta.select(bucketOf(keys, numBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val base = spark.read.parquet(path)
      .filter(col(bucketCol).isin(touched.map(Integer.valueOf): _*))
      .drop(bucketCol)
    val merged = merge(base, delta, keys, patch)
      .withColumn(bucketCol, bucketOf(keys, numBuckets))
    val tmp = path + "__tmp"
    merged.write.partitionBy(bucketCol).mode(SaveMode.Overwrite).parquet(tmp)
    // swap with per-bucket backups (same __old protocol as the flat
    // merge): dst → backup, src in, then drop the backups. Backups live
    // in a `__old` sibling of the TABLE dir (not inside it — partition
    // discovery would parse a leftover `graft_bucket=5.__old` as a
    // partition value). A crash mid-swap leaves either the old or the
    // new bucket present — never neither — and a failure rolls
    // already-swapped buckets back.
    val bakRoot = new Path(path + "__old")
    if (fs.exists(bakRoot)) fs.delete(bakRoot, true)
    fs.mkdirs(bakRoot)
    val swapped = scala.collection.mutable.ListBuffer.empty[Int]
    try {
      touched.foreach { b =>
        val dst = new Path(path, s"$bucketCol=$b")
        val bak = new Path(bakRoot, s"$bucketCol=$b")
        val src = new Path(tmp, s"$bucketCol=$b")
        if (fs.exists(dst)) mustRename(fs, dst, bak)
        // a touched bucket always has rows (it contains its delta rows)
        mustRename(fs, src, dst)
        swapped += b
      }
    } catch {
      case e: Throwable =>
        swapped.foreach { b =>
          val dst = new Path(path, s"$bucketCol=$b")
          val bak = new Path(bakRoot, s"$bucketCol=$b")
          if (fs.exists(bak)) {
            if (fs.exists(dst)) fs.delete(dst, true)
            mustRename(fs, bak, dst)
          }
        }
        fs.delete(new Path(tmp), true)
        throw e
    }
    fs.delete(bakRoot, true)
    fs.delete(new Path(tmp), true)
  }

  /** Snapshot diff (CDC extraction): compare two versions of a keyed
    * table and emit one row per difference with `op` ∈
    * {'insert', 'delete', 'update'} — the change feed the reference's
    * overwrite-in-place sink discards, and the inverse of [[merge]]:
    * `merge(oldDf, diff-as-delta)` reconstructs `newDf`. One
    * full-outer shuffle join on the key (co-located and shuffle-free
    * under bucketing, like the MERGE); `update` compares all shared
    * non-key columns null-safely. Output: key columns + `op` + the
    * NEW row's non-key columns (null for deletes).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val oldCols = oldDf.columns.filterNot(keys.contains)
    val newCols = newDf.columns.filterNot(keys.contains)
    val shared = oldCols.intersect(newCols)
    val o = oldDf.withColumn(present + "_o", lit(true))
    val n = newDf.withColumn(present + "_n", lit(true))
    val joined = o.as("o").join(n.as("n"), keys, "full_outer")
    val changed = shared.map(c =>
      !(col(s"o.$c") <=> col(s"n.$c"))).foldLeft(lit(false))(_ || _)
    val op = when(col(s"o.$present" + "_o").isNull, "insert")
      .when(col(s"n.$present" + "_n").isNull, "delete")
      .when(changed, "update")
    joined.withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(keys.map(col) ++ Seq(col("op")) ++
        newCols.map(c => col(s"n.$c").as(c)): _*)
  }

  /** Apply a [[snapshotDiff]] change feed onto a base table — the
    * CDC-apply inverse: delete ops anti-join their keys out, the rest
    * MERGE in as upserts. `applyDiff(old, snapshotDiff(old, new), keys)
    * ≡ new` (spec-pinned in UpsertSpec); at scale this replays a
    * day's CDC feed in one anti-join + one merge, never rescanning
    * unchanged rows' content.
    */
  def applyDiff(base: DataFrame, diff: DataFrame,
                keys: Seq[String]): DataFrame = {
    val deletes = diff.filter(col("op") === "delete")
      .select(keys.map(col): _*)
    val upserts = diff.filter(col("op") =!= "delete").drop("op")
    merge(base.join(deletes, keys, "left_anti"), upserts, keys)
  }

  /** Build an SCD-type-2 history from a change log: each change row
    * becomes a versioned dimension row with `valid_from` = its change
    * time, `valid_to` = the key's next change time (null while
    * current), and `is_current`. The history view the reference's
    * overwrite-in-place Mongo upserts cannot answer ("what was the
    * state at t?") — one shuffle on the key, one window pass.
    * `tieBreak` orders same-timestamp changes deterministically.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
      tieBreak: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol) +: tieBreak: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time lookup against an [[scd2]] history: the version of
    * each key whose [valid_from, valid_to) range covers `asOf`.
    */
  def scd2AsOf(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
}
