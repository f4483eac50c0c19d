package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared machinery for the tmp→swap→backup rename protocol used by
  * every table-maintenance operator (Upsert merges, IncrementalAgg
  * refreshes, Layout.compact): one place for filesystem resolution,
  * checked renames, crash recovery, and staging-debris retention —
  * so the protocol's invariants hold identically everywhere.
  *
  * Protocol invariants:
  *  - new data is fully written to `<path>__tmp` BEFORE any rename;
  *  - the live dir moves to `<path>__old` and tmp renames in — a crash
  *    leaves AT LEAST ONE complete copy (live, old, or tmp) on disk;
  *  - `__old` is deleted only after a successful swap;
  *  - on entry, a missing live dir with a surviving `__old` means the
  *    crash hit between the two renames: the backup is RESTORED, never
  *    deleted ([[restoreIfCrashed]]).
  */
object Staging {

  /** Staging-sibling suffixes the protocol may leave behind. */
  val suffixes: Seq[String] = Seq("__tmp", "__old", ".__compact")

  /** Resolve the filesystem FROM the path — `FileSystem.get(conf)`
    * answers against fs.defaultFS, which throws "Wrong FS" (or worse,
    * silently answers `exists() = false`) for a table on another
    * scheme (s3a vs hdfs vs file).
    */
  def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hadoop rename reports most failures by RETURNING FALSE, not
    * throwing — an unchecked false in a swap protocol can delete the
    * only surviving copy.
    */
  def mustRename(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(s"rename failed: $src -> $dst")

  /** Crash recovery at operator entry: if the live dir at `path` is
    * missing but `<path>__old` survives, the previous run crashed
    * between rename(live→old) and rename(tmp→live) — restore the
    * backup. Without this, the next maintenance run sees "no table",
    * rebuilds from its delta alone, and silently drops the entire
    * prior table (and any provenance riding inside it). Returns true
    * if a restore happened. A backup alongside a LIVE dir is the
    * opposite case (crash after a successful swap, before cleanup)
    * and is left for [[vacuum]].
    */
  def restoreIfCrashed(fs: FileSystem, path: String): Boolean = {
    val target = new Path(path)
    val bak = new Path(path + "__old")
    if (!fs.exists(target) && fs.exists(bak)) {
      mustRename(fs, bak, target)
      true
    } else false
  }

  /** Bucket-level crash recovery for partitioned tables: a hard crash
    * mid-swap leaves `<path>__old/<prefix>=N` holding a bucket whose
    * live dir is missing — restore each such bucket before reading the
    * table (the per-bucket analogue of [[restoreIfCrashed]]). Backups
    * whose live bucket EXISTS are stale (post-swap crash) and are left
    * for [[vacuum]].
    */
  def restoreBucketsIfCrashed(fs: FileSystem, path: String,
                              prefix: String): Unit = {
    val root = new Path(path)
    val bakRoot = new Path(path + "__old")
    if (fs.exists(root) && fs.exists(bakRoot)) {
      fs.listStatus(bakRoot)
        .filter(_.getPath.getName.startsWith(prefix + "="))
        .foreach { s =>
          val live = new Path(root, s.getPath.getName)
          if (!fs.exists(live)) mustRename(fs, s.getPath, live)
        }
    }
  }

  /** Remove stale staging debris (`<path>__tmp`, `<path>__old`,
    * `<path>.__compact`) older than `horizonMs`. A crash between a
    * successful swap and its cleanup leaves these forever; retention
    * sweeps them without ever touching live data:
    *  - the live dir itself is never a candidate;
    *  - `__old` is kept (regardless of age) while the live dir is
    *    MISSING — that backup is crash-recovery data, the input to
    *    [[restoreIfCrashed]], not debris.
    * Returns the deleted paths. Wired into the compact/merge entry
    * points with a conservative default horizon; callers doing
    * explicit cleanup can pass `horizonMs = 0`.
    */
  def vacuum(spark: SparkSession, path: String,
             horizonMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val fs = fsOf(spark, path)
    val liveExists = fs.exists(new Path(path))
    val cutoff = System.currentTimeMillis() - horizonMs
    suffixes.flatMap { suf =>
      val p = new Path(path + suf)
      val stale = fs.exists(p) &&
        fs.getFileStatus(p).getModificationTime <= cutoff &&
        (suf != "__old" || liveExists)
      if (stale && fs.delete(p, true)) Some(p.toString) else None
    }
  }
}
