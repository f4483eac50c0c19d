package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

case class MediaBlob(media_id: Long, media_type: String,
                     content: Array[Byte])

case class DecodedMeta(media_id: Long, media_type: String,
                       width: Int, height: Int, payload_bytes: Long,
                       decode_ok: Boolean)

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
object Multimodal extends Serializable
    with WavCodec with PngCodec with Y4mCodec with JpegCodec with WebImageCodec with Vp8lCodec with Vp8Codec with BrotliCodec with CompressionCodec with TextCharsetCodec with Mp4Codec with AudioCodec with FlacPcmCodec with PdfCodec with MpegTsCodec with DispatchCodec {


  val Magic: Int = 0x47524d4d // "GRMM"

  // The metadata row types live at the package level (Spark encoders
  // need static case classes); these aliases keep every existing
  // `Multimodal.X` reference and import compiling unchanged.
  type DecodedMeta = graft.multimodal.DecodedMeta
  val DecodedMeta: graft.multimodal.DecodedMeta.type = graft.multimodal.DecodedMeta
  type AacMeta = graft.multimodal.AacMeta
  val AacMeta: graft.multimodal.AacMeta.type = graft.multimodal.AacMeta
  type DecompressedText = graft.multimodal.DecompressedText
  val DecompressedText: graft.multimodal.DecompressedText.type = graft.multimodal.DecompressedText
  type DispatchedMeta = graft.multimodal.DispatchedMeta
  val DispatchedMeta: graft.multimodal.DispatchedMeta.type = graft.multimodal.DispatchedMeta
  type FlacMeta = graft.multimodal.FlacMeta
  val FlacMeta: graft.multimodal.FlacMeta.type = graft.multimodal.FlacMeta
  type GifMeta = graft.multimodal.GifMeta
  val GifMeta: graft.multimodal.GifMeta.type = graft.multimodal.GifMeta
  type GzipText = graft.multimodal.GzipText
  val GzipText: graft.multimodal.GzipText.type = graft.multimodal.GzipText
  type Id3Tags = graft.multimodal.Id3Tags
  val Id3Tags: graft.multimodal.Id3Tags.type = graft.multimodal.Id3Tags
  type ImageHashBit = graft.multimodal.ImageHashBit
  val ImageHashBit: graft.multimodal.ImageHashBit.type = graft.multimodal.ImageHashBit
  type ImageQuality = graft.multimodal.ImageQuality
  val ImageQuality: graft.multimodal.ImageQuality.type = graft.multimodal.ImageQuality
  type JpegExif = graft.multimodal.JpegExif
  val JpegExif: graft.multimodal.JpegExif.type = graft.multimodal.JpegExif
  type JpegMeta = graft.multimodal.JpegMeta
  val JpegMeta: graft.multimodal.JpegMeta.type = graft.multimodal.JpegMeta
  type MediaBlob = graft.multimodal.MediaBlob
  val MediaBlob: graft.multimodal.MediaBlob.type = graft.multimodal.MediaBlob
  type Mp3Meta = graft.multimodal.Mp3Meta
  val Mp3Meta: graft.multimodal.Mp3Meta.type = graft.multimodal.Mp3Meta
  type Mp4Meta = graft.multimodal.Mp4Meta
  val Mp4Meta: graft.multimodal.Mp4Meta.type = graft.multimodal.Mp4Meta
  type OggMeta = graft.multimodal.OggMeta
  val OggMeta: graft.multimodal.OggMeta.type = graft.multimodal.OggMeta
  type PdfPage = graft.multimodal.PdfPage
  val PdfPage: graft.multimodal.PdfPage.type = graft.multimodal.PdfPage
  type PngMeta = graft.multimodal.PngMeta
  val PngMeta: graft.multimodal.PngMeta.type = graft.multimodal.PngMeta
  type ResizedFrame = graft.multimodal.ResizedFrame
  val ResizedFrame: graft.multimodal.ResizedFrame.type = graft.multimodal.ResizedFrame
  type SceneCut = graft.multimodal.SceneCut
  val SceneCut: graft.multimodal.SceneCut.type = graft.multimodal.SceneCut
  type TextBlob = graft.multimodal.TextBlob
  val TextBlob: graft.multimodal.TextBlob.type = graft.multimodal.TextBlob
  type TsStream = graft.multimodal.TsStream
  val TsStream: graft.multimodal.TsStream.type = graft.multimodal.TsStream
  type VideoFrame = graft.multimodal.VideoFrame
  val VideoFrame: graft.multimodal.VideoFrame.type = graft.multimodal.VideoFrame
  type WavMeta = graft.multimodal.WavMeta
  val WavMeta: graft.multimodal.WavMeta.type = graft.multimodal.WavMeta
  type WavStats = graft.multimodal.WavStats
  val WavStats: graft.multimodal.WavStats.type = graft.multimodal.WavStats
  type WavWindow = graft.multimodal.WavWindow
  val WavWindow: graft.multimodal.WavWindow.type = graft.multimodal.WavWindow
  type WebpMeta = graft.multimodal.WebpMeta
  val WebpMeta: graft.multimodal.WebpMeta.type = graft.multimodal.WebpMeta
  type Y4mMeta = graft.multimodal.Y4mMeta
  val Y4mMeta: graft.multimodal.Y4mMeta.type = graft.multimodal.Y4mMeta


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
}
