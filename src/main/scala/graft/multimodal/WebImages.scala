package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** `variant` is the first recognized VP8-family chunk: "VP8" (lossy
  * — dims from the sync-coded frame header), "VP8L" (lossless — the
  * 14-bit packed dims), or "VP8X" (extended — 24-bit canvas dims).
  */
case class WebpMeta(media_id: Long, variant: String, width: Int,
                    height: Int, decode_ok: Boolean)

/** `version` is "87a" or "89a"; `gct` mirrors the global-color-table
  * flag bit (real GIFs nearly always set it — the sniffed value is a
  * triage signal, not a decode input).
  */
case class GifMeta(media_id: Long, version: String, width: Int,
                   height: Int, gct: Boolean, decode_ok: Boolean)

/** WebP (VP8/VP8L/VP8X) and GIF: fixed-header metadata walks and genuine minimal writers.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait WebImageCodec extends Serializable {
  // ------------------------------------------------------------------
  // WebP + GIF: metadata-only image legs. A real crawl image column is
  // heavily WebP (RIFF....WEBP) and GIF; both parse dims from fixed
  // headers with no entropy decode — the parseJpeg pattern: bounds as
  // Long, truncation or a bad signature is a row property, never a
  // task failure.
  // ------------------------------------------------------------------


  private val BadWebp = WebpMeta(0L, "", -1, -1, decode_ok = false)

  /** RIFF/WEBP metadata walk: chunk headers only, first VP8 / VP8L /
    * VP8X chunk wins (VP8X carries the extended file's CANVAS dims —
    * the per-frame VP8 chunk after it describes a frame, not the
    * image). Chunk sizes are read as unsigned Longs and every bound is
    * checked BEFORE use (the RIFF-walk overflow lesson): a declared
    * size past the buffer, a truncated header, or a VP8 body without
    * the 0x9D012A sync code all route to decode_ok=false.
    */
  def parseWebp(id: Long, bytes: Array[Byte]): WebpMeta = {
    def ascii(off: Int, n: Int): String =
      if (bytes.length >= off + n) new String(bytes, off, n, "US-ASCII")
      else ""
    def u(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def u32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16)).toLong |
        (u(i + 3).toLong << 24)
    val bad = BadWebp.copy(media_id = id)
    if (bytes.length < 12 || ascii(0, 4) != "RIFF" ||
      ascii(8, 4) != "WEBP") return bad
    var off = 12L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val cc = ascii(o, 4)
      val size = u32(o + 4)
      val p = off + 8
      if (p + size > bytes.length) return bad // truncated payload
      val pi = p.toInt
      cc match {
        case "VP8 " =>
          return if (size >= 10 && u(pi + 3) == 0x9d &&
            u(pi + 4) == 0x01 && u(pi + 5) == 0x2a)
            WebpMeta(id, "VP8", u16(pi + 6) & 0x3fff,
              u16(pi + 8) & 0x3fff, decode_ok = true)
          else bad
        case "VP8L" =>
          return if (size >= 5 && u(pi) == 0x2f) {
            val b = u32(pi + 1)
            WebpMeta(id, "VP8L", (b & 0x3fff).toInt + 1,
              ((b >> 14) & 0x3fff).toInt + 1, decode_ok = true)
          } else bad
        case "VP8X" =>
          return if (size >= 10)
            WebpMeta(id, "VP8X",
              (u(pi + 4) | (u(pi + 5) << 8) | (u(pi + 6) << 16)) + 1,
              (u(pi + 7) | (u(pi + 8) << 8) | (u(pi + 9) << 16)) + 1,
              decode_ok = true)
          else bad
        case _ => // unrecognized chunk (ICCP, EXIF, ...): skip, padded
      }
      off = p + size + (size & 1L)
    }
    bad
  }

  /** Genuine minimal WebP container for the requested variant —
    * RIFF/WEBP + one VP8/VP8L/VP8X chunk whose header encodes the
    * dims exactly as [[parseWebp]] reads them. Deterministic per id.
    */
  def syntheticWebp(id: Long, width: Int, height: Int,
                    variant: String): MediaBlob = {
    require(width >= 1 && height >= 1 && width <= 0x3fff &&
      height <= 0x3fff, "dims must fit the 14-bit VP8 fields")
    val (cc, payload) = variant match {
      case "VP8" =>
        val bb = java.nio.ByteBuffer.allocate(10)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        // 3-byte frame tag (deterministic filler), then sync + dims
        bb.put(0x30.toByte).put(0x01.toByte).put(0x00.toByte)
        bb.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
        bb.putShort(width.toShort).putShort(height.toShort)
        ("VP8 ", bb.array())
      case "VP8L" =>
        val bits = (width - 1) | ((height - 1) << 14)
        val bb = java.nio.ByteBuffer.allocate(5)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(0x2f.toByte).putInt(bits)
        ("VP8L", bb.array())
      case "VP8X" =>
        val bb = java.nio.ByteBuffer.allocate(10)
        bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        val (w1, h1) = (width - 1, height - 1)
        bb.put((w1 & 0xff).toByte).put(((w1 >> 8) & 0xff).toByte)
          .put(((w1 >> 16) & 0xff).toByte)
        bb.put((h1 & 0xff).toByte).put(((h1 >> 8) & 0xff).toByte)
          .put(((h1 >> 16) & 0xff).toByte)
        ("VP8X", bb.array())
      case other =>
        throw new IllegalArgumentException(s"unknown variant $other")
    }
    val pad = payload.length & 1
    val riffSize = 4 + 8 + payload.length + pad
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WEBP".getBytes("US-ASCII"))
    bb.put(cc.getBytes("US-ASCII")).putInt(payload.length).put(payload)
    if (pad == 1) bb.put(0.toByte)
    MediaBlob(id, "image/webp", bb.array())
  }


  private val BadGif =
    GifMeta(0L, "", -1, -1, gct = false, decode_ok = false)

  /** GIF logical-screen descriptor: 6-byte signature+version then
    * 16-bit LE canvas dims and the packed flags byte — 13 fixed bytes,
    * no block walk needed for metadata. Anything shorter or with a
    * version other than 87a/89a routes to decode_ok=false.
    */
  def parseGif(id: Long, bytes: Array[Byte]): GifMeta = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 13 ||
      new String(bytes, 0, 3, "US-ASCII") != "GIF")
      return BadGif.copy(media_id = id)
    val v = new String(bytes, 3, 3, "US-ASCII")
    if (v != "87a" && v != "89a") return BadGif.copy(media_id = id)
    GifMeta(id, v, u(6) | (u(7) << 8), u(8) | (u(9) << 8),
      (u(10) & 0x80) != 0, decode_ok = true)
  }

  /** Minimal genuine GIF: signature + logical screen descriptor +
    * trailer. Deterministic per id; any GIF tool accepts it as an
    * (empty) image stream.
    */
  def syntheticGif(id: Long, width: Int, height: Int,
                   v89: Boolean): MediaBlob = {
    require(width >= 1 && height >= 1 && width <= 0xffff &&
      height <= 0xffff)
    val bb = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put((if (v89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    bb.putShort(width.toShort).putShort(height.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg, aspect
    bb.put(0x3b.toByte)                          // trailer
    MediaBlob(id, "image/gif", bb.array())
  }
}
