package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** `variant` is the first recognized VP8-family chunk: "VP8" (lossy
  * — dims from the sync-coded frame header), "VP8L" (lossless — the
  * 14-bit packed dims), or "VP8X" (extended — 24-bit canvas dims).
  * `frame_count`/`anim_duration_ms`: for VP8X the walk continues
  * past the header chunk counting ANMF frames and summing their
  * 24-bit durations — the triage signal separating animations (meme
  * crawl) from photos; a still VP8/VP8L IS one frame (count 1,
  * duration 0), a non-animated VP8X counts 0 ANMF chunks.
  */
case class WebpMeta(media_id: Long, variant: String, width: Int,
                    height: Int, frame_count: Int,
                    anim_duration_ms: Long, decode_ok: Boolean)

/** `version` is "87a" or "89a"; `gct` mirrors the global-color-table
  * flag bit (real GIFs nearly always set it — the sniffed value is a
  * triage signal, not a decode input). `frame_count` counts image
  * descriptors and `duration_cs` sums the graphic-control-extension
  * delays (centiseconds — GIF's native unit): 0/0 for a bare header,
  * ≥2 frames flags an animation. The block walk stops (keeping the
  * counts so far) at the trailer or any bound violation — the header
  * facts stay valid even when the stream is cut mid-animation.
  */
case class GifMeta(media_id: Long, version: String, width: Int,
                   height: Int, gct: Boolean, frame_count: Int,
                   duration_cs: Int, decode_ok: Boolean)

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


  private val BadWebp =
    WebpMeta(0L, "", -1, -1, -1, -1L, decode_ok = false)

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
    // VP8X streams keep walking after the header chunk: ANMF chunks
    // carry one animation frame each, their 24-bit duration at
    // payload offset 12
    var vp8x: WebpMeta = null
    var anmf = 0
    var animMs = 0L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val cc = ascii(o, 4)
      val size = u32(o + 4)
      val p = off + 8
      if (p + size > bytes.length) return bad // truncated payload
      val pi = p.toInt
      cc match {
        case "VP8 " if vp8x == null =>
          return if (size >= 10 && u(pi + 3) == 0x9d &&
            u(pi + 4) == 0x01 && u(pi + 5) == 0x2a)
            WebpMeta(id, "VP8", u16(pi + 6) & 0x3fff,
              u16(pi + 8) & 0x3fff, 1, 0L, decode_ok = true)
          else bad
        case "VP8L" if vp8x == null =>
          return if (size >= 5 && u(pi) == 0x2f) {
            val b = u32(pi + 1)
            WebpMeta(id, "VP8L", (b & 0x3fff).toInt + 1,
              ((b >> 14) & 0x3fff).toInt + 1, 1, 0L, decode_ok = true)
          } else bad
        case "VP8X" if vp8x == null =>
          if (size < 10) return bad
          vp8x = WebpMeta(id, "VP8X",
            (u(pi + 4) | (u(pi + 5) << 8) | (u(pi + 6) << 16)) + 1,
            (u(pi + 7) | (u(pi + 8) << 8) | (u(pi + 9) << 16)) + 1,
            0, 0L, decode_ok = true)
        case "ANMF" if vp8x != null =>
          if (size >= 16) {
            anmf += 1
            animMs += u(pi + 12) | (u(pi + 13) << 8) | (u(pi + 14) << 16)
          }
        case _ => // unrecognized chunk (ICCP, EXIF, ...): skip, padded
      }
      off = p + size + (size & 1L)
    }
    if (vp8x != null)
      vp8x.copy(frame_count = anmf, anim_duration_ms = animMs)
    else bad
  }

  /** Genuine minimal WebP container for the requested variant —
    * RIFF/WEBP + one VP8/VP8L/VP8X chunk whose header encodes the
    * dims exactly as [[parseWebp]] reads them. A VP8X with
    * `frames > 0` becomes an animation: the ANIM flag set, an ANIM
    * chunk (background + loop count), and `frames` ANMF chunks each
    * declaring `frameDurationMs` in its 24-bit duration field.
    * Deterministic per id.
    */
  def syntheticWebp(id: Long, width: Int, height: Int,
                    variant: String, frames: Int = 0,
                    frameDurationMs: Int = 0): MediaBlob = {
    require(frames == 0 || variant == "VP8X",
      "animation frames need the extended (VP8X) container")
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
        bb.put((if (frames > 0) 0x02 else 0).toByte) // ANIM flag
          .put(0.toByte).put(0.toByte).put(0.toByte)
        val (w1, h1) = (width - 1, height - 1)
        bb.put((w1 & 0xff).toByte).put(((w1 >> 8) & 0xff).toByte)
          .put(((w1 >> 16) & 0xff).toByte)
        bb.put((h1 & 0xff).toByte).put(((h1 >> 8) & 0xff).toByte)
          .put(((h1 >> 16) & 0xff).toByte)
        ("VP8X", bb.array())
      case other =>
        throw new IllegalArgumentException(s"unknown variant $other")
    }
    def chunk(cc4: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer
        .allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(cc4.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array() // trailing pad byte (if any) is the zero default
    }
    val chunks = new java.io.ByteArrayOutputStream()
    chunks.write(chunk(cc, payload))
    if (frames > 0) {
      chunks.write(chunk("ANIM", new Array[Byte](6))) // bg + loop 0
      for (k <- 0 until frames) {
        // ANMF header: x/y/(w-1)/(h-1) as 24-bit LE, duration 24-bit,
        // flags byte — then a token frame payload
        val f = java.nio.ByteBuffer.allocate(16 + 4)
        def le24(v: Int): Unit = {
          f.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
            .put(((v >> 16) & 0xff).toByte)
        }
        le24(0); le24(0); le24(width - 1); le24(height - 1)
        le24(frameDurationMs)
        f.put(0.toByte)
        f.put(((id * 131 + k) & 0xff).toByte).put(0.toByte)
          .put(0.toByte).put(0.toByte)
        chunks.write(chunk("ANMF", f.array()))
      }
    }
    val body = chunks.toByteArray
    val riffSize = 4 + body.length
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WEBP".getBytes("US-ASCII")).put(body)
    MediaBlob(id, "image/webp", bb.array())
  }


  private val BadGif =
    GifMeta(0L, "", -1, -1, gct = false, -1, -1, decode_ok = false)

  /** GIF parse: the 13-byte logical-screen descriptor (signature +
    * version, 16-bit LE canvas dims, packed flags), then the block
    * walk — image descriptors (0x2C, counting frames, skipping local
    * color tables and LZW sub-blocks), extensions (0x21, summing
    * graphic-control delay fields), trailer (0x3B). The walk stops at
    * any bound violation keeping the counts so far; anything shorter
    * than the descriptor or with a version other than 87a/89a routes
    * to decode_ok=false.
    */
  def parseGif(id: Long, bytes: Array[Byte]): GifMeta = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 13 ||
      new String(bytes, 0, 3, "US-ASCII") != "GIF")
      return BadGif.copy(media_id = id)
    val v = new String(bytes, 3, 3, "US-ASCII")
    if (v != "87a" && v != "89a") return BadGif.copy(media_id = id)
    val packed = u(10)
    var off = 13
    if ((packed & 0x80) != 0) off += 3 * (1 << ((packed & 0x7) + 1))
    var frames = 0
    var delayCs = 0
    // sub-blocks: length-prefixed runs until a zero terminator
    def skipSubBlocks(at: Int): Int = {
      var o = at
      while (o < bytes.length && u(o) != 0) o += 1 + u(o)
      if (o < bytes.length) o + 1 else bytes.length
    }
    var walking = true
    while (walking && off < bytes.length) {
      u(off) match {
        case 0x2c => // image descriptor: 10 bytes + LCT + LZW data
          if (off + 10 > bytes.length) walking = false
          else {
            frames += 1
            val p = u(off + 9)
            var o = off + 10
            if ((p & 0x80) != 0) o += 3 * (1 << ((p & 0x7) + 1))
            o += 1 // LZW minimum code size
            if (o > bytes.length) walking = false
            else off = skipSubBlocks(o)
          }
        case 0x21 => // extension: label + sub-blocks
          if (off + 2 > bytes.length) walking = false
          else {
            // graphic control (0xF9): delay (cs) at block offset 1-2
            if (u(off + 1) == 0xf9 && off + 7 <= bytes.length &&
              u(off + 2) == 4)
              delayCs += u(off + 4) | (u(off + 5) << 8)
            off = skipSubBlocks(off + 2)
          }
        case 0x3b => walking = false // trailer
        case _ => walking = false    // junk: keep the counts so far
      }
    }
    GifMeta(id, v, u(6) | (u(7) << 8), u(8) | (u(9) << 8),
      (packed & 0x80) != 0, frames, delayCs, decode_ok = true)
  }

  // ------------------------------------------------------ GIF pixels
  // Full first-frame pixel decode: real LZW (variable code width,
  // clear/EOI, the KwKwK case, 4096-entry freeze), global/local color
  // tables, the 4-pass interlace ordering, frame-rect composite onto
  // the canvas. The encoder side is a genuine LZW compressor (hash-
  // chained dictionary, width growth mirrored against the decoder's
  // one-code lag) so fixtures travel the same bit-level path as any
  // conforming GIF writer — the spec round-trips a JDK-ImageIO-encoded
  // image to prove decode independence from this file's writer.
  // ------------------------------------------------------------------

  /** GIF-variant LZW compress of palette indices at `minCode` bits.
    * Emits an initial clear code; code width grows one step before the
    * next code would overflow it (`next > 2^width` at emit time — the
    * exact mirror of the decoder's `next == 2^width` post-add bump,
    * which lags the encoder by one code); at 4096 entries the
    * dictionary FREEZES (no mid-stream clear) — both ends stop adding
    * at the same code index, so the streams stay in lockstep.
    */
  def gifLzwEncode(minCode: Int,
                                       indices: Array[Byte]): Array[Byte] = {
    require(minCode >= 2 && minCode <= 8)
    require(indices.nonEmpty)
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Integer, Integer](4096)
    val bos = new java.io.ByteArrayOutputStream()
    var acc = 0
    var nbits = 0
    def emit(code: Int): Unit = {
      if (next > (1 << width) && width < 12) width += 1
      acc |= code << nbits
      nbits += width
      while (nbits >= 8) {
        bos.write(acc & 0xff); acc >>>= 8; nbits -= 8
      }
    }
    emit(clear)
    var prev = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((prev << 8) | k)
      val e = dict.get(key)
      if (e != null) prev = e.intValue()
      else {
        emit(prev)
        if (next < 4096) { dict.put(key, Integer.valueOf(next)); next += 1 }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(eoi)
    if (nbits > 0) bos.write(acc & 0xff)
    bos.toByteArray
  }

  /** GIF-variant LZW decompress to exactly `expected` indices. Rejects
    * (None) truncated bitstreams, codes past the dictionary frontier,
    * or a literal frontier violation after clear; tolerates streams
    * carrying MORE pixels than the frame declares (stops at
    * `expected`, like every shipping decoder).
    */
  def gifLzwDecode(minCode: Int, data: Array[Byte],
                                       expected: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8 || expected <= 0) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var got = 0
    var acc = 0
    var nbits = 0
    var p = 0
    def read(): Int = {
      while (nbits < width && p < data.length) {
        acc |= (data(p) & 0xff) << nbits; nbits += 8; p += 1
      }
      if (nbits < width) -1
      else {
        val v = acc & ((1 << width) - 1)
        acc >>>= width; nbits -= width; v
      }
    }
    var prev = -1
    var done = false
    while (!done && got < expected) {
      val code = read()
      if (code < 0) return None
      if (code == clear) { next = eoi + 1; width = minCode + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first code must be a literal
        out(got) = code.toByte; got += 1; prev = code
      } else {
        var sp = 0
        var cur = code
        if (code > next) return None
        if (code == next) { // KwKwK: string(prev) + first(string(prev))
          var c = prev
          while (c >= clear + 2) c = prefix(c)
          stack(sp) = c.toByte; sp += 1
          cur = prev
        }
        while (cur >= clear + 2) {
          stack(sp) = suffix(cur); sp += 1; cur = prefix(cur)
        }
        stack(sp) = cur.toByte; sp += 1
        val first = stack(sp - 1)
        while (sp > 0 && got < expected) {
          sp -= 1; out(got) = stack(sp); got += 1
        }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next < 4096 && next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (got == expected) Some(out) else None
  }

  /** Interlaced GIF row order: pass 1 rows 0,8,16…, pass 2 4,12…,
    * pass 3 2,6,10…, pass 4 1,3,5… — the order frame rows appear in
    * the LZW stream.
    */
  private def gifInterlaceRows(h: Int): Array[Int] = {
    val starts = Array(0, 4, 2, 1)
    val steps = Array(8, 8, 4, 2)
    val rows = new Array[Int](h)
    var k = 0
    var pass = 0
    while (pass < 4) {
      var r = starts(pass)
      while (r < h) { rows(k) = r; k += 1; r += steps(pass) }
      pass += 1
    }
    rows
  }

  /** Genuine palette GIF writer: GIF89a signature, logical screen
    * descriptor, a power-of-two global color table, one full-canvas
    * image descriptor and a REAL LZW-compressed index stream
    * ([[gifLzwEncode]]), trailer. `palette` is packed RGB triplets
    * (length 3·2ᵏ); `interlace` stores rows in the 4-pass order.
    */
  def gifEncode(width: Int, height: Int, indices: Array[Byte],
                palette: Array[Byte],
                interlace: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0xffff &&
      height <= 0xffff)
    require(indices.length == width * height, "one index per pixel")
    require(palette.length % 3 == 0)
    val n = palette.length / 3
    require(n >= 2 && n <= 256 && Integer.bitCount(n) == 1,
      "palette must hold a power-of-two entry count in [2, 256]")
    val sizeBits = 31 - Integer.numberOfLeadingZeros(n) // log2(n)
    require(indices.forall(b => (b & 0xff) < n), "index out of palette")
    val out = new java.io.ByteArrayOutputStream()
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(width.toShort).putShort(height.toShort)
    bb.put((0x80 | (sizeBits - 1)).toByte) // GCT present, 2^sizeBits
      .put(0.toByte).put(0.toByte)         // bg index, aspect
    out.write(bb.array())
    out.write(palette)
    val d = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    d.put(0x2c.toByte).putShort(0).putShort(0)
      .putShort(width.toShort).putShort(height.toShort)
      .put((if (interlace) 0x40 else 0).toByte)
    out.write(d.array())
    val stored =
      if (!interlace) indices
      else {
        val rows = gifInterlaceRows(height)
        val t = new Array[Byte](indices.length)
        var k = 0
        while (k < height) {
          System.arraycopy(indices, rows(k) * width, t, k * width, width)
          k += 1
        }
        t
      }
    val minCode = math.max(2, sizeBits)
    out.write(minCode)
    val lzw = gifLzwEncode(minCode, stored)
    var o = 0
    while (o < lzw.length) {
      val m = math.min(255, lzw.length - o)
      out.write(m)
      out.write(lzw, o, m)
      o += m
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** [[syntheticPngGradient]]'s GIF twin: the SAME wrapped-gradient
    * pixels — `gray(x,y) = (id·31 + x·7 + y·13) mod 256` — through a
    * 256-entry grayscale palette and real LZW, so one oracle formula
    * replays both containers and the cross-format near-dup join sees
    * hamming-0 pairs between a PNG and its GIF re-encode.
    */
  def syntheticGifGradient(id: Long, width: Int, height: Int,
                           tweakOrigin: Boolean = false,
                           interlace: Boolean = false): MediaBlob = {
    val idx = new Array[Byte](width * height)
    (0 until height).foreach { y =>
      (0 until width).foreach { x =>
        val g0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = if (tweakOrigin && x == 0 && y == 0) (g0 + 1) % 256
                else g0
        idx(y * width + x) = g.toByte
      }
    }
    val pal = new Array[Byte](256 * 3)
    (0 until 256).foreach { i =>
      pal(i * 3) = i.toByte; pal(i * 3 + 1) = i.toByte
      pal(i * 3 + 2) = i.toByte
    }
    MediaBlob(id, "image/gif", gifEncode(width, height, idx, pal,
      interlace = interlace))
  }

  /** FULL first-frame pixel decode of a GIF: canvas initialized to the
    * background color (when a global table exists), the first image
    * descriptor's rectangle LZW-decoded ([[gifLzwDecode]]) through its
    * local-or-global palette — honoring the interlace flag — and
    * composited at its offset. Returns (canvasW, canvasH, RGB) or None
    * for anything [[parseGif]] rejects plus: no palette for the frame,
    * frame rect outside the canvas, palette-range violations, LZW
    * malformations, or a stream that ends before any frame. The same
    * never-fail contract as [[decodePngPixels]].
    */
  def decodeGifPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val meta = parseGif(0L, bytes)
    if (!meta.decode_ok || meta.width <= 0 || meta.height <= 0) return None
    val w = meta.width
    val h = meta.height
    if (w.toLong * h * 3 > (1L << 28)) return None
    def u(i: Int): Int = bytes(i) & 0xff
    val packed = u(10)
    var off = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val nc = 1 << ((packed & 0x7) + 1)
      if (off + 3 * nc > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, off, off + 3 * nc)
      off += 3 * nc
    }
    val canvas = new Array[Byte](w * h * 3)
    val bg = u(11)
    if (gct != null && bg * 3 + 2 < gct.length) {
      var i = 0
      while (i < w * h) {
        canvas(i * 3) = gct(bg * 3)
        canvas(i * 3 + 1) = gct(bg * 3 + 1)
        canvas(i * 3 + 2) = gct(bg * 3 + 2)
        i += 1
      }
    }
    def skipSubBlocks(at: Int): Int = {
      var o = at
      while (o < bytes.length && u(o) != 0) o += 1 + u(o)
      if (o < bytes.length) o + 1 else bytes.length
    }
    while (off < bytes.length) {
      u(off) match {
        case 0x21 =>
          if (off + 2 > bytes.length) return None
          off = skipSubBlocks(off + 2)
        case 0x2c =>
          if (off + 10 > bytes.length) return None
          val fx = u(off + 1) | (u(off + 2) << 8)
          val fy = u(off + 3) | (u(off + 4) << 8)
          val fw = u(off + 5) | (u(off + 6) << 8)
          val fh = u(off + 7) | (u(off + 8) << 8)
          val p = u(off + 9)
          var o = off + 10
          var pal = gct
          if ((p & 0x80) != 0) {
            val nc = 1 << ((p & 0x7) + 1)
            if (o + 3 * nc > bytes.length) return None
            pal = java.util.Arrays.copyOfRange(bytes, o, o + 3 * nc)
            o += 3 * nc
          }
          if (pal == null) return None
          if (fw <= 0 || fh <= 0 || fx + fw > w || fy + fh > h)
            return None
          if (o >= bytes.length) return None
          val minCode = u(o)
          o += 1
          // concatenate the LZW sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var bo = o
          while (bo < bytes.length && u(bo) != 0) {
            val m = u(bo)
            if (bo + 1 + m > bytes.length) return None
            data.write(bytes, bo + 1, m)
            bo += 1 + m
          }
          val idx = gifLzwDecode(minCode, data.toByteArray, fw * fh)
            .getOrElse(return None)
          val palN = pal.length / 3
          val rows =
            if ((p & 0x40) != 0) gifInterlaceRows(fh)
            else Array.tabulate(fh)(identity)
          var k = 0
          while (k < fh) {
            val cy = fy + rows(k)
            var x = 0
            while (x < fw) {
              val ci = idx(k * fw + x) & 0xff
              if (ci >= palN) return None
              val dst = (cy * w + fx + x) * 3
              canvas(dst) = pal(ci * 3)
              canvas(dst + 1) = pal(ci * 3 + 1)
              canvas(dst + 2) = pal(ci * 3 + 2)
              x += 1
            }
            k += 1
          }
          return Some((w, h, canvas))
        case 0x3b => return None // trailer before any frame
        case _ => return None
      }
    }
    None
  }

  /** Minimal genuine GIF: signature + logical screen descriptor +
    * `frames` frames (each a graphic-control extension declaring
    * `delayCs` centiseconds, a full-canvas image descriptor and a
    * token LZW data stream) + trailer. Deterministic per id; any GIF
    * tool accepts it as an image stream.
    */
  def syntheticGif(id: Long, width: Int, height: Int,
                   v89: Boolean, frames: Int = 0,
                   delayCs: Int = 0): MediaBlob = {
    require(width >= 1 && height >= 1 && width <= 0xffff &&
      height <= 0xffff)
    require(frames == 0 || v89, "GCE delays need GIF89a")
    val out = new java.io.ByteArrayOutputStream()
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put((if (v89) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    bb.putShort(width.toShort).putShort(height.toShort)
    bb.put(0.toByte).put(0.toByte).put(0.toByte) // packed, bg, aspect
    out.write(bb.array())
    for (k <- 0 until frames) {
      // graphic control extension: delay in centiseconds
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); out.write(delayCs & 0xff)
      out.write((delayCs >> 8) & 0xff); out.write(0); out.write(0)
      // image descriptor: full canvas, no local color table
      val d = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      d.put(0x2c.toByte).putShort(0).putShort(0)
        .putShort(width.toShort).putShort(height.toShort)
        .put(0.toByte)
      out.write(d.array())
      // token LZW stream: min code size + one data sub-block + end
      out.write(2); out.write(1)
      out.write(((id * 131 + k) & 0xff).toInt); out.write(0)
    }
    out.write(0x3b) // trailer
    MediaBlob(id, "image/gif", out.toByteArray)
  }

  // ----------------------------------------------------------- BMP

  /** FULL pixel decode of an uncompressed BMP to RGB triplets — the
    * no-codec image format scanners, screenshots and legacy archives
    * still carry: BITMAPINFOHEADER (40) and the V4/V5 (108/124)
    * extensions, BI_RGB only, 24/32-bit truecolor and 8-bit paletted,
    * bottom-up (positive height) AND top-down (negative height) row
    * orders, 4-byte row padding. Anything else (RLE, 1/4-bit, BI_*
    * compressions) → None — the [[Vp8lCodec.decodeWebpPixels]]
    * never-fail contract.
    */
  def decodeBmpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16)).toLong |
        ((bytes(i + 3) & 0xff).toLong << 24)
    def s32(i: Int): Int = u32(i).toInt
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
      return None
    val dataOff = u32(10)
    val hdrSize = u32(14)
    if (hdrSize != 40 && hdrSize != 108 && hdrSize != 124) return None
    val w = s32(18)
    val hRaw = s32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = u16(26)
    val bpp = u16(28)
    val compression = u32(30)
    if (w <= 0 || h <= 0 || planes != 1 || compression != 0L) return None
    if (w.toLong * h * 3 > (1L << 28)) return None
    if (bpp != 8 && bpp != 24 && bpp != 32) return None
    val paletteAt = 14 + hdrSize.toInt
    val paletteN = if (bpp == 8) {
      val declared = u32(46)
      if (declared == 0L) 256 else declared.toInt
    } else 0
    if (bpp == 8 && paletteAt + paletteN * 4 > dataOff) return None
    val rowBytes = ((w * bpp / 8) + 3) & ~3
    if (dataOff + rowBytes.toLong * h > bytes.length) return None
    val rgb = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = dataOff.toInt + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val o = (row * w + x) * 3
        bpp match {
          case 8 =>
            val idx = bytes(base + x) & 0xff
            if (idx >= paletteN) return None
            val p = paletteAt + idx * 4 // BGRA quads
            rgb(o) = bytes(p + 2); rgb(o + 1) = bytes(p + 1)
            rgb(o + 2) = bytes(p)
          case 24 =>
            val p = base + x * 3 // BGR
            rgb(o) = bytes(p + 2); rgb(o + 1) = bytes(p + 1)
            rgb(o + 2) = bytes(p)
          case 32 =>
            val p = base + x * 4 // BGRA/BGRX
            rgb(o) = bytes(p + 2); rgb(o + 1) = bytes(p + 1)
            rgb(o + 2) = bytes(p)
        }
        x += 1
      }
      row += 1
    }
    Some((w, h, rgb))
  }

  /** 24-bit BI_RGB bottom-up BMP writer (any viewer opens it);
    * `topDown` emits the negative-height top-down variant
    */
  def bmpEncode(width: Int, height: Int, rgb: Array[Byte],
                topDown: Boolean = false): Array[Byte] = {
    require(rgb.length == width * height * 3)
    val rowBytes = ((width * 3) + 3) & ~3
    val dataSize = rowBytes * height
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(width)
      .putInt(if (topDown) -height else height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < height) {
      val srcRow = if (topDown) row else height - 1 - row
      var x = 0
      while (x < width) {
        val p = (srcRow * width + x) * 3
        bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row += 1
    }
    bb.array()
  }

  // ---------------------------------------------------------- TIFF

  /** TIFF-variant LZW compress (TIFF 6 §13): MSB-first bit packing,
    * fixed 256-symbol alphabet, ClearCode 256 / EOI 257, initial code
    * width 9, and the spec's EARLY CHANGE — the width bumps when the
    * next free slot reaches 2^w - 1 (511/1023/2047), one code sooner
    * than GIF's variant (gifLzwEncode). Table resets via ClearCode
    * just before slot 4094 so width never exceeds 12 bits.
    */
  def tiffLzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var nbits = 0; var width = 9
    def put(code: Int): Unit = {
      cur = (cur << width) | code; nbits += width
      while (nbits >= 8) {
        out.write(((cur >>> (nbits - 8)) & 0xff).toInt); nbits -= 8
      }
    }
    // (prefixCode << 8 | byte) → code, like gifLzwEncode's dict
    var dict = new java.util.HashMap[Integer, Integer](4096)
    var next = 258
    put(256)
    var omega = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (omega < 0) omega = k
      else {
        val key = (omega << 8) | k
        val hit = dict.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          put(omega)
          dict.put(key, next); next += 1
          // the decoder's table lags this one by one entry, so its
          // early-change bump (next == 2^w - 1, mirrored below in
          // tiffLzwDecode) corresponds to next == 2^w here — the same
          // ±1 pairing gifLzwEncode documents for the GIF variant
          if (next == (1 << width) && width < 12) width += 1
          omega = k
          if (next >= 4094) { // reset before a 13-bit slot could exist
            put(omega); put(256)
            dict = new java.util.HashMap[Integer, Integer](4096)
            next = 258; width = 9; omega = -1
          }
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    put(257)
    if (nbits > 0) out.write(((cur << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF-variant LZW decompress to exactly `expected` bytes; None on
    * any malformed stream (bad first code, out-of-range code, early
    * end). Mirrors [[tiffLzwEncode]]'s early-change width schedule.
    */
  def tiffLzwDecode(data: Array[Byte], expected: Int):
      Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var produced = 0
    var cur = 0L; var nbits = 0; var pos = 0; var width = 9
    def code(): Int = {
      while (nbits < width && pos < data.length) {
        cur = (cur << 8) | (data(pos) & 0xff); nbits += 8; pos += 1
      }
      if (nbits < width) -1
      else {
        val c = ((cur >>> (nbits - width)) & ((1 << width) - 1)).toInt
        nbits -= width; c
      }
    }
    // parallel prefix/suffix arrays, entries 0-255 implicit
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var prev = -1
    def emit(c: Int): Boolean = { // expand code c into out
      var top = 0; var x = c
      while (x >= 258) {
        if (top >= stack.length || x >= next) return false
        stack(top) = suffix(x); top += 1; x = prefix(x)
      }
      if (x >= 256) return false
      stack(top) = x.toByte; top += 1
      if (produced + top > expected) return false
      while (top > 0) {
        top -= 1; out(produced) = stack(top); produced += 1
      }
      true
    }
    def firstByte(c: Int): Byte = {
      var x = c
      while (x >= 258) x = prefix(x)
      x.toByte
    }
    var done = false
    while (!done && produced < expected) {
      val c = code()
      if (c < 0 || c == 257) done = true
      else if (c == 256) { next = 258; width = 9; prev = -1 }
      else if (prev < 0) {
        if (c >= 256 || !emit(c)) return None
        prev = c
      } else {
        if (c < next) {
          if (!emit(c)) return None
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = firstByte(c); next += 1
          }
        } else if (c == next && next < 4096) {
          prefix(next) = prev; suffix(next) = firstByte(prev); next += 1
          if (!emit(next - 1)) return None
        } else return None
        if (next == (1 << width) - 1 && width < 12) width += 1
        prev = c
      }
    }
    if (produced == expected) Some(out) else None
  }

  /** PackBits (TIFF 6 §9) run-length compress: literal runs up to 128,
    * repeat runs of ≥2 (≥3 when breaking a literal, per the spec's
    * recommendation) up to 128.
    */
  def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run); out.write(data(i) & 0xff); i += run
      } else {
        // literal run: until a ≥3 repeat starts (a 2-repeat is
        // cheaper carried inside the literal) or 128 bytes
        var lit = 1
        var stop = false
        while (!stop && i + lit < data.length && lit < 128) {
          if (i + lit + 2 < data.length &&
            data(i + lit) == data(i + lit + 1) &&
            data(i + lit) == data(i + lit + 2)) stop = true
          else lit += 1
        }
        out.write(lit - 1)
        out.write(data, i, lit)
        i += lit
      }
    }
    out.toByteArray
  }

  /** PackBits decompress to exactly `expected` bytes; None on
    * truncation or overrun. The -128 control byte is a no-op per spec.
    */
  def packBitsDecode(data: Array[Byte], expected: Int):
      Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var produced = 0; var i = 0
    while (i < data.length && produced < expected) {
      val n = data(i); i += 1
      if (n >= 0) {
        val len = n + 1
        if (i + len > data.length || produced + len > expected)
          return None
        System.arraycopy(data, i, out, produced, len)
        i += len; produced += len
      } else if (n != -128) {
        val len = 1 - n
        if (i >= data.length || produced + len > expected) return None
        java.util.Arrays.fill(out, produced, produced + len, data(i))
        i += 1; produced += len
      }
    }
    if (produced == expected) Some(out) else None
  }

  /** FULL pixel decode of a TIFF to RGB triplets — the scanner/
    * archival format (and the container EXIF borrowed its IFD grammar
    * from): both byte orders (II/MM), IFD0's required tags,
    * Compression 1 (none), 5 (LZW, with Predictor 2 horizontal
    * differencing — the libtiff default for LZW) and 32773 (PackBits),
    * 8-bit grayscale (PhotometricInterp 1, and 0 = WhiteIsZero
    * inverted) and 8-bit-per-sample RGB, multiple strips via
    * StripOffsets/StripByteCounts/RowsPerStrip, AND the §15 tiled
    * layout (TileWidth/TileLength/TileOffsets/TileByteCounts — how
    * real-web compressed TIFFs commonly ship): each tile decompresses
    * through the same LZW/PackBits/Predictor-2 path to a full
    * tileW×tileH raster (edge tiles padded per spec), then the
    * in-bounds region lands in the frame. Anything else (16-bit,
    * palettes, JPEG-in-TIFF) → None — the never-fail contract of the
    * pixel family.
    */
  def decodeTiffPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 &&
        bytes(3) == 0) true
      else if (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        bytes(3) == 42) false
      else return None
    def u16(i: Int): Int =
      if (i + 2 > bytes.length) -1
      else if (le) (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      else ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (i + 4 > bytes.length) -1L
      else if (le) ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16)).toLong |
        ((bytes(i + 3) & 0xff).toLong << 24)
      else ((bytes(i) & 0xff).toLong << 24) |
        (((bytes(i + 1) & 0xff) << 16) | ((bytes(i + 2) & 0xff) << 8) |
          (bytes(i + 3) & 0xff)).toLong
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || ifd + 2 + n * 12 > bytes.length) return None
    // tag → (type, count, value-or-offset slot position)
    var width = -1; var height = -1; var compression = 1
    var photometric = -1; var spp = 1; var bps = 8
    var rowsPerStrip = Int.MaxValue
    var predictor = 1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var tileW = -1; var tileH = -1
    var tileOffsets: Array[Long] = null
    var tileCounts: Array[Long] = null
    def values(entry: Int): Array[Long] = {
      val typ = u16(entry + 2)
      val count = u32(entry + 4).toInt
      val size = typ match {
        case 1 => 1; case 3 => 2; case 4 => 4; case _ => -1
      }
      if (size < 0 || count <= 0 || count > (1 << 20)) return null
      val at =
        if (size * count <= 4) entry + 8 else u32(entry + 8).toInt
      if (at < 0 || at + size * count > bytes.length) return null
      Array.tabulate(count) { k =>
        size match {
          case 1 => (bytes(at + k) & 0xff).toLong
          case 2 => u16(at + k * 2).toLong
          case _ => u32(at + k * 4)
        }
      }
    }
    var e = 0
    while (e < n) {
      val entry = ifd.toInt + 2 + e * 12
      val tag = u16(entry)
      lazy val v = values(entry)
      tag match {
        case 256 => if (v == null) return None else width = v(0).toInt
        case 257 => if (v == null) return None else height = v(0).toInt
        case 258 => if (v == null) return None
          else if (v.exists(_ != 8L)) return None
        case 259 => if (v == null) return None
          else compression = v(0).toInt
        case 262 => if (v == null) return None
          else photometric = v(0).toInt
        case 273 => if (v == null) return None else stripOffsets = v
        case 277 => if (v == null) return None else spp = v(0).toInt
        case 278 => if (v == null) return None
          else rowsPerStrip = v(0).toInt
        case 279 => if (v == null) return None else stripCounts = v
        case 317 => if (v == null) return None
          else predictor = v(0).toInt
        case 322 => if (v == null) return None else tileW = v(0).toInt
        case 323 => if (v == null) return None else tileH = v(0).toInt
        case 324 => if (v == null) return None else tileOffsets = v
        case 325 => if (v == null) return None else tileCounts = v
        case _ => // orientation, resolution, software, ...: ignored
      }
      e += 1
    }
    val tiled = tileOffsets != null || tileCounts != null ||
      tileW > 0 || tileH > 0
    if (width <= 0 || height <= 0 ||
      (compression != 1 && compression != 5 && compression != 32773) ||
      (predictor != 1 && predictor != 2)) return None
    if (tiled) {
      if (stripOffsets != null || stripCounts != null) return None
      if (tileW <= 0 || tileH <= 0 || tileOffsets == null ||
        tileCounts == null ||
        tileOffsets.length != tileCounts.length) return None
    } else if (stripOffsets == null || stripCounts == null ||
      stripOffsets.length != stripCounts.length) return None
    if (width.toLong * height * 3 > (1L << 28)) return None
    val gray = photometric == 0 || photometric == 1
    if (!(gray && spp == 1) && !(photometric == 2 && spp == 3))
      return None
    val rowBytes = width * spp
    if (!tiled && rowsPerStrip <= 0) return None
    // slice one compressed chunk (strip or tile), decompress
    // (identity / LZW / PackBits) to its exact raster size, then undo
    // Predictor 2's horizontal differencing over rows of `chunkRow`
    def chunk(off: Long, cnt: Long, want: Int,
        chunkRow: Int): Array[Byte] = {
      if (off < 0 || cnt < 0 || off + cnt > bytes.length) return null
      val data = compression match {
        case 1 =>
          if (cnt < want) None
          else {
            val a = new Array[Byte](want)
            System.arraycopy(bytes, off.toInt, a, 0, want)
            Some(a)
          }
        case 5 =>
          val s = new Array[Byte](cnt.toInt)
          System.arraycopy(bytes, off.toInt, s, 0, cnt.toInt)
          tiffLzwDecode(s, want)
        case _ =>
          val s = new Array[Byte](cnt.toInt)
          System.arraycopy(bytes, off.toInt, s, 0, cnt.toInt)
          packBitsDecode(s, want)
      }
      data match {
        case None => null
        case Some(d) =>
          if (predictor == 2) {
            val rows = want / chunkRow
            var r = 0
            while (r < rows) {
              var x = spp
              while (x < chunkRow) {
                d(r * chunkRow + x) =
                  (d(r * chunkRow + x) + d(r * chunkRow + x - spp)).toByte
                x += 1
              }
              r += 1
            }
          }
          d
      }
    }
    val raster = new Array[Byte](rowBytes * height)
    if (tiled) {
      // §15: tiles are full tileW×tileH rasters laid out left-to-
      // right, top-to-bottom; edge tiles carry padding that never
      // reaches the frame
      val across = (width + tileW - 1) / tileW
      val down = (height + tileH - 1) / tileH
      if (tileOffsets.length != across * down) return None
      val tileRow = tileW * spp
      var t = 0
      while (t < across * down) {
        val d = chunk(tileOffsets(t), tileCounts(t),
          tileRow * tileH, tileRow)
        if (d == null) return None
        val x0 = (t % across) * tileW
        val y0 = (t / across) * tileH
        val copyW = math.min(tileW, width - x0) * spp
        val copyH = math.min(tileH, height - y0)
        var r = 0
        while (r < copyH) {
          System.arraycopy(d, r * tileRow,
            raster, (y0 + r) * rowBytes + x0 * spp, copyW)
          r += 1
        }
        t += 1
      }
    } else {
      val nStrips = stripOffsets.length
      var strip = 0
      var rasterAt = 0
      while (strip < nStrips && rasterAt < raster.length) {
        val rowsHere = math.min(rowsPerStrip.toLong,
          height.toLong - strip.toLong * rowsPerStrip).toInt
        if (rowsHere <= 0) return None
        val want = rowsHere * rowBytes
        val d = chunk(stripOffsets(strip), stripCounts(strip), want,
          rowBytes)
        if (d == null) return None
        System.arraycopy(d, 0, raster, rasterAt, want)
        rasterAt += want
        strip += 1
      }
      if (rasterAt != raster.length) return None
    }
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val at = row * rowBytes
      var x = 0
      while (x < width) {
        val o = (row * width + x) * 3
        if (gray) {
          val g0 = raster(at + x) & 0xff
          val g = if (photometric == 0) 255 - g0 else g0
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          rgb(o) = raster(at + x * 3)
          rgb(o + 1) = raster(at + x * 3 + 1)
          rgb(o + 2) = raster(at + x * 3 + 2)
        }
        x += 1
      }
      row += 1
    }
    Some((width, height, rgb))
  }

  /** TIFF writer: II byte order, 8-bit grayscale (spp 1,
    * PhotometricInterp 1) or RGB (spp 3), strips of `rowsPerStrip`
    * rows OR (tileSize > 0, a multiple of 16 per §15) square tiles
    * with zero-padded edges, Compression 1 (none), 5 (LZW, optionally
    * with Predictor 2 horizontal differencing — per tile row in tiled
    * mode) or 32773 (PackBits). Any TIFF reader opens it (TiffSpec
    * proves LZW/PackBits and tiled output through JDK ImageIO).
    */
  def tiffEncode(width: Int, height: Int, rgb: Array[Byte],
                 grayscale: Boolean = false,
                 rowsPerStrip: Int = Int.MaxValue,
                 compression: Int = 1,
                 predictor: Int = 1,
                 tileSize: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * 3)
    require(compression == 1 || compression == 5 || compression == 32773)
    require(predictor == 1 || (predictor == 2 && compression == 5))
    // §15: tile dims must be multiples of 16
    require(tileSize == 0 || (tileSize > 0 && tileSize % 16 == 0))
    val tiledOut = tileSize > 0
    val rps = math.min(rowsPerStrip, height)
    val nStrips = (height + rps - 1) / rps
    val spp = if (grayscale) 1 else 3
    val rowBytes = width * spp
    // raster in sample order (gray takes R of each triplet — r==g==b
    // by contract); predictor differencing happens per chunk below
    // (a tile's rows difference within the tile, not the frame row)
    val raster = new Array[Byte](rowBytes * height)
    var i = 0
    while (i < width * height) {
      if (grayscale) raster(i) = rgb(i * 3)
      else {
        raster(i * 3) = rgb(i * 3); raster(i * 3 + 1) = rgb(i * 3 + 1)
        raster(i * 3 + 2) = rgb(i * 3 + 2)
      }
      i += 1
    }
    def diffRows(d: Array[Byte], chunkRow: Int): Array[Byte] = {
      if (predictor == 2) {
        val rows = d.length / chunkRow
        var row = 0
        while (row < rows) {
          var x = chunkRow - 1
          while (x >= spp) {
            d(row * chunkRow + x) =
              (d(row * chunkRow + x) - d(row * chunkRow + x - spp)).toByte
            x -= 1
          }
          row += 1
        }
      }
      d
    }
    def compress(raw: Array[Byte]): Array[Byte] = compression match {
      case 1 => raw
      case 5 => tiffLzwEncode(raw)
      case _ => packBitsEncode(raw)
    }
    val across = if (tiledOut) (width + tileSize - 1) / tileSize else 0
    val down = if (tiledOut) (height + tileSize - 1) / tileSize else 0
    val chunks: Array[Array[Byte]] =
      if (tiledOut) Array.tabulate(across * down) { t =>
        // full tileSize×tileSize raster; edge tiles zero-padded
        val tileRow = tileSize * spp
        val raw = new Array[Byte](tileRow * tileSize)
        val x0 = (t % across) * tileSize
        val y0 = (t / across) * tileSize
        val copyW = math.min(tileSize, width - x0) * spp
        val copyH = math.min(tileSize, height - y0)
        var r = 0
        while (r < copyH) {
          System.arraycopy(raster, (y0 + r) * rowBytes + x0 * spp,
            raw, r * tileRow, copyW)
          r += 1
        }
        compress(diffRows(raw, tileRow))
      }
      else Array.tabulate(nStrips) { s =>
        val rows = math.min(rps, height - s * rps)
        val raw = new Array[Byte](rows * rowBytes)
        System.arraycopy(raster, s * rps * rowBytes, raw, 0, raw.length)
        compress(diffRows(raw, rowBytes))
      }
    val nChunks = chunks.length
    val multi = nChunks > 1 // count-1 LONG values live inline
    val nTags = (if (tiledOut) 10 else 9) + (if (predictor == 2) 1 else 0)
    val ifdAt = 8
    val ifdSize = 2 + nTags * 12 + 4
    // external value areas: RGB BitsPerSample needs a 3-SHORT array
    // (6 bytes, padded even), multi-chunk needs offset/count LONGs
    val bpsAt = ifdAt + ifdSize
    val bpsSize = if (grayscale) 0 else 8
    val chunksAt = bpsAt + bpsSize
    val chunksSize = if (multi) nChunks * 8 else 0
    val dataAt = chunksAt + chunksSize
    val dataSize = chunks.iterator.map(_.length).sum
    val out = java.nio.ByteBuffer
      .allocate(dataAt + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdAt)
    out.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Long): Unit =
      out.putShort(id.toShort).putShort(typ.toShort).putInt(count)
        .putInt(value.toInt)
    tag(256, 4, 1, width)
    tag(257, 4, 1, height)
    if (grayscale) tag(258, 3, 1, 8)
    else tag(258, 3, 3, bpsAt) // {8,8,8} external array
    tag(259, 3, 1, compression)
    tag(262, 3, 1, if (grayscale) 1 else 2)
    if (!tiledOut) {
      if (multi) tag(273, 4, nChunks, chunksAt)
      else tag(273, 4, 1, dataAt)
    }
    tag(277, 3, 1, spp)
    if (!tiledOut) {
      tag(278, 4, 1, rps)
      if (multi) tag(279, 4, nChunks, chunksAt + nChunks * 4)
      else tag(279, 4, 1, chunks(0).length)
    }
    if (predictor == 2) tag(317, 3, 1, 2)
    if (tiledOut) {
      tag(322, 4, 1, tileSize)
      tag(323, 4, 1, tileSize)
      if (multi) {
        tag(324, 4, nChunks, chunksAt)
        tag(325, 4, nChunks, chunksAt + nChunks * 4)
      } else {
        tag(324, 4, 1, dataAt)
        tag(325, 4, 1, chunks(0).length)
      }
    }
    out.putInt(0) // next IFD
    if (!grayscale) {
      out.putShort(8).putShort(8).putShort(8).putShort(0) // + pad
    }
    if (multi) {
      var at = dataAt
      var s = 0
      while (s < nChunks) {
        out.putInt(at); at += chunks(s).length; s += 1
      }
      s = 0
      while (s < nChunks) { out.putInt(chunks(s).length); s += 1 }
    }
    chunks.foreach(out.put)
    out.array()
  }

  /** 8-bit paletted BMP writer: `indices` into a ≤256-entry RGB
    * palette, bottom-up
    */
  def bmpEncodePaletted(width: Int, height: Int, indices: Array[Byte],
                        palette: Array[Byte]): Array[Byte] = {
    require(indices.length == width * height)
    require(palette.length % 3 == 0 && palette.length <= 768)
    val n = palette.length / 3
    val rowBytes = (width + 3) & ~3
    val dataOff = 54 + n * 4
    val dataSize = rowBytes * height
    val bb = java.nio.ByteBuffer.allocate(dataOff + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(dataOff + dataSize)
      .putInt(0).putInt(dataOff)
    bb.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(8).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(n).putInt(0)
    var i = 0
    while (i < n) { // BGRA quads
      bb.put(palette(i * 3 + 2)).put(palette(i * 3 + 1))
        .put(palette(i * 3)).put(0.toByte)
      i += 1
    }
    var row = height - 1
    while (row >= 0) {
      var x = 0
      while (x < width) { bb.put(indices(row * width + x)); x += 1 }
      var pad = rowBytes - width
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }
}
