package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators (K6): the engine-side equivalent of the
  * reference's Qdrant payload keyword indexes on topic_id/url
  * (embedded_articles.py:203-212). Clustering rows by key and sorting
  * within partitions gives parquet min/max row-group skipping on that
  * key — the scan-side index a shared-nothing engine actually uses.
  */
object Layout {

  /** Cluster by `keyCol` into `n` partitions, sorted within partitions
    * by (key, sortCols…). Every key lands in exactly one partition.
    */
  def byKey(df: DataFrame, keyCol: String, n: Int,
            sortCols: String*): DataFrame =
    df.repartition(n, col(keyCol))
      .sortWithinPartitions((keyCol +: sortCols).map(col): _*)

  /** Z-order (Morton) clustering over TWO numeric columns — [[byKey]]
    * clusters one key; a query mix filtering on either of two columns
    * needs both clustered at once. Each column is linearly binned into
    * 2^`bits` buckets between its min and max (computed as a 1-row
    * aggregate broadcast into the scan — no driver round-trip), the
    * bin indices are bit-interleaved into a Morton code, and rows are
    * range-partitioned + sorted by it. Every output file then covers a
    * small rectangle of (A, B) space, so parquet min/max row-group /
    * file skipping works for predicates on A, on B, or both — the
    * standard lakehouse multi-dimensional clustering (cf. the
    * z-ordering literature: Morton 1966; Delta/Iceberg OPTIMIZE
    * ZORDER). LayoutSpec asserts the per-file span contraction that
    * skipping relies on.
    */
  def zorder(df: DataFrame, colA: String, colB: String, n: Int,
             bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val stats = df.agg(
      min(col(colA)).cast("double").as("__amin"),
      max(col(colA)).cast("double").as("__amax"),
      min(col(colB)).cast("double").as("__bmin"),
      max(col(colB)).cast("double").as("__bmax"))
    val maxBin = (1 << bits) - 1
    // bins are LONG: at bits=16 the interleaved b-bit for i=15 lands
    // on position 31 — the sign bit of an int — which would corrupt
    // the sort order. Nulls bin explicitly to 0 (least() would
    // otherwise skip the null and silently place them at maxBin).
    def bin(c: Column, lo: Column, hi: Column): Column =
      when(c.isNull, lit(0L))
        .when(hi > lo,
          least(lit(maxBin.toLong),
            floor((c.cast("double") - lo) / (hi - lo) * (maxBin + 1))
              .cast("long")))
        .otherwise(0L)
    def interleave(za: Column, zb: Column): Column =
      graft.functions.Vectors.bound(za) { a =>
        graft.functions.Vectors.bound(zb) { b =>
          (0 until bits).map { i =>
            shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i)
              .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
          }.reduce((x, y) => x.bitwiseOR(y))
        }
      }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(
        bin(col(colA), col("__amin"), col("__amax")),
        bin(col(colB), col("__bmin"), col("__bmax"))))
      .drop("__amin", "__amax", "__bmin", "__bmax")
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Small-file compaction — the operational half of K6/K7: streaming
    * and incremental sinks (q80's index appends, Streams' per-batch
    * files) accrete many small files, and at 100 TB the scan cost is
    * dominated by per-file open/footer overhead long before bytes.
    * Rewrites a FLAT (unpartitioned) parquet table dir into
    * ≈`targetBytes`-sized files (sized from the CURRENT on-disk
    * footprint — metadata only, no data read), atomically: write to
    * `<dir>.__compact`, swap via rename,
    * drop the old dir only after the swap (the `Upsert.__old` backup
    * protocol). Content is preserved row-for-row; only the file
    * layout changes. Returns (filesBefore, filesAfter). Rename-swap
    * is atomic on local/HDFS paths; object stores without atomic
    * rename should route through their table format's OPTIMIZE
    * instead.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val d = new java.io.File(dir)
    def parquetFiles(f: java.io.File): Array[java.io.File] =
      f.listFiles().filter(_.getName.endsWith(".parquet"))
    val before = parquetFiles(d)
    val totalBytes = before.map(_.length()).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(dir + ".__compact")
    val old = new java.io.File(dir + ".__old")
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.getPath)
    if (!d.renameTo(old)) sys.error(s"compact: cannot stage $dir")
    if (!tmp.renameTo(d)) {        // roll back, table untouched
      old.renameTo(d)
      sys.error(s"compact: cannot swap in ${tmp.getPath}")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(old)
    (before.length, parquetFiles(d).length)
  }
}
