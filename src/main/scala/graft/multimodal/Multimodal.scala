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

  case class WavMeta(media_id: Long, sample_rate: Int, channels: Int,
                     bits_per_sample: Int, data_bytes: Long,
                     duration_ms: Long, decode_ok: Boolean)

  private val BadWav = WavMeta(0L, -1, -1, -1, -1L, -1L, decode_ok = false)

  /** Minimal RIFF/WAVE writer: canonical PCM header (RIFF size, WAVE,
    * `fmt ` 16-byte block, `data` chunk) + deterministic payload. WAV
    * is the reference's actual blob type (tts_utils.py:31-35 writes
    * synthesized speech as wav) — these are REAL wav bytes any audio
    * tool would accept, generated without audio libraries.
    */
  def syntheticWav(id: Long, sampleRate: Int, channels: Int,
                   bitsPerSample: Int, nFrames: Int): MediaBlob = {
    val blockAlign = channels * bitsPerSample / 8
    val dataLen = nFrames * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var x = id
    (0 until dataLen).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    MediaBlob(id, "audio", bb.array())
  }

  /** REAL RIFF/WAVE header parse — the codec behind the decode seam.
    * Walks the chunk list (a legal wav may carry LIST/fact chunks
    * before `data`, and chunks pad to even offsets) instead of
    * assuming the canonical 44-byte layout; any malformation —
    * truncation, wrong magic, missing fmt/data, zero byte rate —
    * routes to `decode_ok = false` rather than failing the task.
    * `duration_ms` floors `data_bytes·1000 / byte_rate` in long
    * arithmetic.
    */
  def parseWav(id: Long, bytes: Array[Byte]): WavMeta = {
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
      return BadWav.copy(media_id = id)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, byteRate, bits
    var dataLen = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val cid = ascii(off)
      val size = buf.getInt(off + 4).toLong & 0xFFFFFFFFL
      val body = off + 8
      cid match {
        case "fmt " if size >= 16 && body + 16 <= bytes.length =>
          fmt = Some((buf.getShort(body + 2).toInt, buf.getInt(body + 4),
            buf.getInt(body + 8), buf.getShort(body + 14).toInt))
        case "data" if body + size <= bytes.length =>
          dataLen = size
        case _ => // unknown/short chunk: skip
      }
      // a declared size past EOF (or ≥2³¹, negative as Int) ends the
      // walk — stepping by it verbatim could loop or go backwards
      val step = size.toInt
      if (step < 0 || body + step > bytes.length) off = bytes.length
      else off = body + step + (step & 1) // chunks pad to even
    }
    fmt match {
      case Some((ch, rate, byteRate, bits))
          if dataLen >= 0 && byteRate > 0 =>
        WavMeta(id, rate, ch, bits, dataLen,
          dataLen * 1000L / byteRate, decode_ok = true)
      case _ => BadWav.copy(media_id = id)
    }
  }

  /** Partition-wise wav decode over binary content — same plan shape as
    * [[decodeStub]] (one decoder per partition, blobs never shuffle)
    * but with the real codec.
    */
  def decodeWav(blobs: Dataset[MediaBlob]): Dataset[WavMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseWav(b.media_id, b.content)))
  }

  case class PngMeta(media_id: Long, width: Int, height: Int,
                     bit_depth: Int, color_type: Int, idat_bytes: Long,
                     decode_ok: Boolean)

  private val BadPng = PngMeta(0L, -1, -1, -1, -1, -1L, decode_ok = false)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Minimal real PNG writer (S4's blobs are images —
    * extract_utils.py:50-59): signature + IHDR + one zlib-deflated
    * IDAT of filter-0 RGB scanlines + IEND, all chunk CRCs genuine
    * (java.util.zip). Any PNG tool accepts the output; generated
    * without image libraries, deterministic per id.
    */
  def syntheticPng(id: Long, width: Int, height: Int): MediaBlob = {
    val crc = new java.util.zip.CRC32()
    def chunk(ctype: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length).put(ctype.getBytes("US-ASCII")).put(body)
      crc.reset()
      crc.update(bb.array(), 4, 4 + body.length)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    // filter-0 scanlines with a deterministic id-seeded pixel pattern
    val raw = new Array[Byte](height * (1 + width * 3))
    var x = id * 6364136223846793005L + 1442695040888963407L
    var p = 0
    (0 until height).foreach { _ =>
      raw(p) = 0; p += 1 // per-row filter byte
      (0 until width * 3).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        raw(p) = (x >>> 56).toByte; p += 1
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    // loop until finished(): pseudorandom pixels are incompressible, so
    // stored-block overhead can exceed any fixed slack — a single
    // deflate() call into a raw.length+64 buffer silently truncates
    // IDAT for large dimensions (valid CRCs over partial data)
    val bos = new java.io.ByteArrayOutputStream(raw.length + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      bos.write(buf, 0, n)
    }
    deflater.end()
    val idat = bos.toByteArray
    val out = PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    MediaBlob(id, "image", out)
  }

  /** REAL PNG header parse — the image codec behind the decode seam,
    * next to [[parseWav]]. Checks the 8-byte signature, requires the
    * first chunk to be a 13-byte IHDR with an intact CRC32 (PNG
    * mandates IHDR first), extracts (width, height, bit depth, color
    * type), then walks the remaining chunk list summing IDAT payload
    * bytes. Any malformation — truncation, wrong signature, corrupt
    * IHDR CRC, absurd dimensions, declared chunk length past EOF —
    * routes to `decode_ok = false` instead of failing the task.
    */
  def parsePng(id: Long, bytes: Array[Byte]): PngMeta = {
    if (bytes.length < 8 + 25 ||
        !java.util.Arrays.equals(
          java.util.Arrays.copyOf(bytes, 8), PngSig))
      return BadPng.copy(media_id = id)
    val buf = java.nio.ByteBuffer.wrap(bytes) // PNG ints are big-endian
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (buf.getInt(8) != 13 || ascii(12) != "IHDR")
      return BadPng.copy(media_id = id)
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 4 + 13)
    if (crc.getValue.toInt != buf.getInt(29))
      return BadPng.copy(media_id = id)
    val (w, h) = (buf.getInt(16), buf.getInt(20))
    val (depth, color) = (bytes(24).toInt & 0xff, bytes(25).toInt & 0xff)
    if (w <= 0 || h <= 0) return BadPng.copy(media_id = id)
    var idatBytes = 0L
    var off = 33 // first chunk after IHDR
    var sawEnd = false
    while (!sawEnd && off + 8 <= bytes.length) {
      val size = buf.getInt(off).toLong & 0xFFFFFFFFL
      val cid = ascii(off + 4)
      // declared length past EOF (the truncation case) aborts the walk
      if (off + 12 + size > bytes.length) off = bytes.length
      else {
        if (cid == "IDAT") idatBytes += size
        if (cid == "IEND") sawEnd = true
        off += 12 + size.toInt
      }
    }
    if (!sawEnd) return BadPng.copy(media_id = id) // truncated stream
    PngMeta(id, w, h, depth, color, idatBytes, decode_ok = true)
  }

  /** Partition-wise PNG decode — same plan shape as [[decodeWav]]:
    * one decoder per partition, blobs never shuffle.
    */
  def decodePng(blobs: Dataset[MediaBlob]): Dataset[PngMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parsePng(b.media_id, b.content)))
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
