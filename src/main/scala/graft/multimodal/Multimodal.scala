package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `BinaryType` content
  * plus typed metadata, with the compute split the way a 100 TB media
  * pipeline needs it —
  *
  *  - metadata-only planning (frame sampling, resize targets) stays
  *    relational: pure column math over (id, meta), prunable and
  *    codegen'd, never touching the blob column;
  *  - blob work (decode) runs partition-wise over the binary column
  *    with one decoder instance per partition — the Scala analogue of
  *    a batched `mapInPandas` decode UDF.
  *
  * The codec itself is STUBBED (no image/audio libraries in this
  * environment): content carries a deterministic 12-byte header
  * (magic, width, height) that [[decodeStub]] parses. The Spark-side
  * plumbing — schema, binary encoders, partition batching, null-safe
  * failure routing — is real and tested; swapping the stub for a JNI
  * or library decoder changes one function.
  */
object Multimodal extends Serializable {

  val Magic: Int = 0x47524d4d // "GRMM"

  case class MediaBlob(media_id: Long, media_type: String,
                       content: Array[Byte])
  case class DecodedMeta(media_id: Long, media_type: String,
                         width: Int, height: Int, payload_bytes: Long,
                         decode_ok: Boolean)

  /** Deterministic fake blob: 12-byte header (magic, width, height big-
    * endian) + pseudo-random payload derived from the id. Stands in for
    * reading real media files; layout is what [[decodeStub]] parses.
    */
  def syntheticBlob(id: Long, mediaType: String, width: Int, height: Int,
                    payloadLen: Int): MediaBlob = {
    val bb = java.nio.ByteBuffer.allocate(12 + payloadLen)
    bb.putInt(Magic).putInt(width).putInt(height)
    var x = id * 6364136223846793005L + 1442695040888963407L
    (0 until payloadLen).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    MediaBlob(id, mediaType, bb.array())
  }

  /** STUB decode (the `???` seam for a real codec): parse the header,
    * route malformed blobs to `decode_ok = false` instead of failing
    * the task. One "decoder" per partition via mapPartitions — blobs
    * never shuffle, the lineage stays columnar.
    */
  def decodeStub(blobs: Dataset[MediaBlob]): Dataset[DecodedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions { it =>
      // per-partition decoder setup would go here (model / codec init)
      it.map { b =>
        val buf = java.nio.ByteBuffer.wrap(b.content)
        if (b.content.length >= 12 && buf.getInt(0) == Magic)
          DecodedMeta(b.media_id, b.media_type,
            buf.getInt(4), buf.getInt(8), b.content.length - 12L, true)
        else
          DecodedMeta(b.media_id, b.media_type, -1, -1, -1L, false)
      }
    }
  }

  /** Frame-sampling plan over (id, duration_ms): one row per sampled
    * frame at `everyMs` cadence, capped at `maxFrames` — metadata-only,
    * fully relational (explode of a bounded sequence).
    */
  def frameSample(media: DataFrame, idCol: String, durationCol: String,
                  everyMs: Long, maxFrames: Int): DataFrame =
    media.withColumn("frame_no",
        explode(sequence(lit(0L),
          least(col(durationCol) / lit(everyMs),
            lit(maxFrames - 1)).cast("long"))))
      .withColumn("frame_ts_ms", col("frame_no") * everyMs)

  /** Resize target preserving aspect ratio: scale the longer edge down
    * to `maxEdge` (never upscale). Pure column math.
    */
  def resizeSpec(width: org.apache.spark.sql.Column,
                 height: org.apache.spark.sql.Column,
                 maxEdge: Int): (org.apache.spark.sql.Column,
                                 org.apache.spark.sql.Column) = {
    val scale = least(lit(1.0), lit(maxEdge.toDouble) /
      greatest(width, height).cast("double"))
    (floor(width * scale).cast("int"), floor(height * scale).cast("int"))
  }

  /** Per-frame feature stand-in: deterministic seeded vector from
    * (id, frame_no) — the shape a batched embedding UDF would emit.
    */
  def frameFeatures(frames: DataFrame, idCol: String, frameCol: String,
                    dim: Int): DataFrame =
    frames.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (pmod(xxhash64(col(idCol), col(frameCol), j), lit(2000)) - 1000)
          .cast("double") / 1000.0))
}
