package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** A named, swappable blob-upload sink stage — the sink-side twin of
  * [[SourcePlugin]], completing the plugin seam story for K8 (the
  * reference's audio upload, upload_audio_utils.py:17-78: per-file
  * HTTP POST returning a blob id, with retry/auth plumbing).
  *
  * Contract: `upload` consumes (key, blob) rows and returns one
  * receipt row per input — (key, blob_id) — produced PARTITION-WISE:
  * an implementation opens one client per partition (`mapPartitions`),
  * never one per row, and never collects blobs to the driver. Uploads
  * must be idempotent per key (task retries replay a partition), which
  * mirrors the reference's overwrite-by-id semantics.
  */
trait SinkPlugin {
  /** Registry key; later registrations under the same name win. */
  def name: String

  /** Upload each (keyCol, blobCol) row; returns (key, blob_id). */
  def upload(df: DataFrame, keyCol: String, blobCol: String): DataFrame
}

/** Offline default: each blob lands at `base/<url-encoded key>.bin`,
  * and the receipt id is that path. The key is percent-encoded before
  * composing the path — a raw key like `../x` or `a/b` would escape
  * or nest below the base directory — and the encoding is injective,
  * so per-key idempotence survives sanitization. Writes are
  * idempotent per key (same path, full overwrite), so task retries
  * are safe — the same property a live uploader must provide via
  * content-addressed or keyed ids.
  *
  * Writes go through the Hadoop FileSystem resolved FROM `base`
  * inside each task, so the tree lands on a SHARED filesystem
  * (file:/hdfs:/s3a:) — executor-local `java.io.File` writes would
  * scatter blobs across worker disks on a real cluster. The task-side
  * FS resolution uses the SESSION's Hadoop configuration (captured in
  * a `SerializableConfiguration` on the driver, the same pattern as
  * Spark's own FS-writing paths): a bare `new Configuration()` would
  * load only executor-classpath XML and drop `spark.hadoop.*`
  * credentials, `fs.s3a.*` keys, and `fs.defaultFS` — the very
  * settings a shared-filesystem write needs.
  */
final case class FileTreeSink(base: String, name: String = "filetree")
    extends SinkPlugin {
  override def upload(df: DataFrame, keyCol: String,
                      blobCol: String): DataFrame = {
    val rows = df.select(col(keyCol).cast("string").as("key"),
      col(blobCol).cast("binary").as("blob"))
    val baseDir = base // avoid serializing `this` into the task closure
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sessionState.newHadoopConf())
    rows.as(Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        // one "client" per partition: the filesystem handle is opened
        // once and reused for every blob in the partition
        val basePath = new org.apache.hadoop.fs.Path(baseDir)
        val fs = basePath.getFileSystem(hconf.value)
        fs.mkdirs(basePath)
        it.map { case (k, b) =>
          val safe = java.net.URLEncoder.encode(k, "UTF-8")
          val p = new org.apache.hadoop.fs.Path(basePath, s"$safe.bin")
          val os = fs.create(p, true)
          try os.write(b) finally os.close()
          // receipt id = the path under the caller's base, scheme as
          // given (a plain local base stays a plain path)
          (k, p.toString)
        }
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .toDF("key", "blob_id")
  }
}

/** Process-wide sink registry, mirroring [[Sources]]: call sites name
  * a sink (`Sinks("blob")`) and a live deployment re-points the name
  * at an HTTP uploader without touching pipeline code.
  */
object Sinks {

  private val registry = new ConcurrentHashMap[String, SinkPlugin]()

  def register(p: SinkPlugin): Unit = registry.put(p.name, p)

  def apply(name: String): SinkPlugin = {
    val p = registry.get(name)
    if (p == null) throw new NoSuchElementException(
      s"no SinkPlugin '$name' registered; have: ${names.mkString(", ")}")
    p
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }

  register(FileTreeSink(
    base = sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_blobs",
    name = "blob"))
}
