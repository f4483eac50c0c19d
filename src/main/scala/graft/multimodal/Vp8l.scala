package graft.multimodal

/** WebP lossless (VP8L) pixel decode + a genuine minimal encoder.
  *
  * WebP is a dominant crawl image format, and VP8L (the lossless
  * variant) is exact integer arithmetic end-to-end — spec-replayable
  * the way [[PngCodec]] is — so the perceptual-hash / near-dup /
  * quality family can cover it without a native library. The decoder
  * implements the published lossless bitstream (RFC 9649 §3-5):
  *
  *  - LSB-first bit reading; canonical prefix codes in both "simple"
  *    (1-2 symbol) and "normal" (code-length-coded, with 16/17/18
  *    repeats and the optional max_symbol cap) forms;
  *  - the spatially-coded ARGB image: literals (green/red/blue/alpha),
  *    LZ77 backward references (length/distance prefix coding with
  *    extra bits, the 120-entry 2D short-distance neighborhood map),
  *    and the optional color cache (0x1e35a7bd multiplicative hash);
  *  - meta prefix groups (an entropy image selecting one of several
  *    prefix-code groups per 2^b × 2^b tile);
  *  - all four transforms, inverted in reverse signaling order:
  *    PREDICTOR (14 spatial modes with the exact edge rules),
  *    COLOR (green→red/blue cross deltas, 3.5 fixed-point),
  *    SUBTRACT_GREEN, and COLOR_INDEXING (palette, including the
  *    sub-byte pixel bundling for palettes of ≤16 entries).
  *
  * The encoder emits a conforming subset (used by fixtures and specs:
  * literals + optional color cache under real canonical prefix codes,
  * optional SUBTRACT_GREEN and COLOR_INDEXING transforms), so decode
  * tests exercise the same entropy machinery a libwebp stream uses.
  * Like every codec here the decoder NEVER fails a task: any
  * malformation routes to None (a row property upstream).
  *
  * Reference behavioral analogue: the reference pipeline treats crawl
  * images as opaque blobs (extract_utils.py:50-59); this codec is the
  * Spark-side pixel seam those blobs flow through.
  */
private[multimodal] trait Vp8lCodec extends Serializable {
  self: Vp8Codec => // lossy fallback for decodeWebpPixels


  // ---------------------------------------------------------------- bits

  private final class BitReader(bytes: Array[Byte], start: Int) {
    private var pos = start
    private var acc = 0L
    private var nbits = 0
    var bad = false
    def read(n: Int): Int = {
      while (nbits < n) {
        if (pos < bytes.length) {
          acc |= (bytes(pos) & 0xffL) << nbits
          pos += 1
          nbits += 8
        } else { bad = true; return 0 }
      }
      val v = (acc & ((1L << n) - 1)).toInt
      acc >>>= n
      nbits -= n
      v
    }
    def bit(): Int = read(1)
  }

  // ------------------------------------------------- canonical prefix code

  /** Decode table for one canonical prefix code: symbols sorted by
    * (code length, symbol), with per-length first-code/offset arrays —
    * codes are read MSB-first bit-by-bit (the deflate convention VP8L
    * shares). `single >= 0` short-circuits the degenerate one-symbol
    * code, which consumes ZERO bits per symbol.
    */
  private final class PrefixCode(lengths: Array[Int]) {
    val maxLen = 15
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach { l => if (l > 0) count(l) += 1 }
    val totalSyms: Int = count.sum
    val single: Int =
      if (totalSyms == 1) lengths.indexWhere(_ > 0) else -1
    // first canonical code value and symbol-table offset per length
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    private val syms = new Array[Int](math.max(totalSyms, 1))
    var valid: Boolean = {
      var code = 0
      var ok = true
      var l = 1
      var off = 0
      while (l <= maxLen) {
        firstCode(l) = code
        offset(l) = off
        off += count(l)
        code += count(l)
        if (code > (1 << l)) ok = false
        code <<= 1
        l += 1
      }
      // fill symbol table in canonical (length, symbol) order
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { syms(next(len)) = s; next(len) += 1 }
        s += 1
      }
      // a complete code (or the allowed single-symbol degenerate one)
      ok && (totalSyms <= 1 || {
        var kraft = 0L
        var i = 1
        while (i <= maxLen) { kraft += count(i).toLong << (maxLen - i); i += 1 }
        kraft == (1L << maxLen)
      })
    }
    def readSym(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code << 1) | br.bit()
        if (br.bad) return -1
        val c = count(l)
        val d = code - firstCode(l)
        if (c > 0 && d >= 0 && d < c) return syms(offset(l) + d)
        l += 1
      }
      -1
    }
  }

  /** kCodeLengthCodeOrder — the fixed transmission order of the
    * code-length code's own lengths. NOTE the published order places
    * the repeat-previous symbol 16 BETWEEN literals 5 and 6 (unlike
    * DEFLATE's order): getting this wrong desynchronizes every
    * normal-coded foreign stream at its first literal >= 6 while
    * remaining perfectly self-consistent — found and pinned by the
    * foreign-stream fixtures in WebPixelsSpec.
    */
  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code over `alphabetSize` symbols: the 1-bit
    * simple/normal selector, then either 1-2 explicit symbols or the
    * code-length-coded lengths (with 16/17/18 repeat symbols and the
    * optional max_symbol cap). Returns null on malformation.
    */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) { // simple
      val numSymbols = br.bit() + 1
      val first8 = br.bit()
      val s0 = if (first8 == 1) br.read(8) else br.bit()
      if (s0 >= alphabetSize) return null
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.read(8)
        if (s1 >= alphabetSize || s1 == s0) return null
        lengths(s1) = 1
      }
      if (br.bad) return null
      val pc = new PrefixCode(lengths)
      if (!pc.valid) null else pc
    } else {
      val numCodeLengths = 4 + br.read(4)
      if (numCodeLengths > ClcOrder.length) return null
      val clcLen = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) { clcLen(ClcOrder(i)) = br.read(3); i += 1 }
      if (br.bad) return null
      val clc = new PrefixCode(clcLen)
      if (!clc.valid || clc.totalSyms == 0) return null
      // optional cap on the number of coded symbols
      var maxSymbol = alphabetSize
      if (br.bit() == 1) {
        val lenNBits = 2 + 2 * br.read(3)
        maxSymbol = 2 + br.read(lenNBits)
        if (br.bad || maxSymbol > alphabetSize) return null
      }
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clc.readSym(br)
        if (s < 0) return null
        if (s < 16) {
          lengths(sym) = s; sym += 1
          if (s != 0) prevLen = s
        } else if (s == 16) {
          val rep = 3 + br.read(2)
          if (sym + rep > alphabetSize) return null
          var k = 0
          while (k < rep) { lengths(sym) = prevLen; sym += 1; k += 1 }
        } else if (s == 17) {
          val rep = 3 + br.read(3)
          if (sym + rep > alphabetSize) return null
          sym += rep
        } else { // 18
          val rep = 11 + br.read(7)
          if (sym + rep > alphabetSize) return null
          sym += rep
        }
        if (br.bad) return null
      }
      val pc = new PrefixCode(lengths)
      if (!pc.valid) null else pc
    }
  }

  // ----------------------------------------------------- lz77 mappings

  /** LZ77 prefix value decode: codes 0-3 are 1-4; above that,
    * `extra = (code - 2) >> 1` extra bits on offset
    * `(2 + (code & 1)) << extra`.
    */
  private def lz77Value(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.read(extra) + 1
    }

  /** The 120-entry short-distance neighborhood (the spec's literal
    * kCodeToPlane table, RFC 9649 §5.2.3, transcribed as (dx, dy)):
    * distance codes 1-120 index this table; codes above 120 carry
    * `code - 120` directly. Hardcoded verbatim — Vp8lTableSpec pins
    * it against the (d², larger-dy, positive-dx) ordering rule it
    * follows, but the table itself is the source of truth.
    */
  private[graft] val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0),  (1, 1),  (-1, 1), (0, 2),  (2, 0),  (1, 2),  (-1, 2),
    (2, 1), (-2, 1), (2, 2),  (-2, 2), (0, 3),  (3, 0),  (1, 3),  (-1, 3),
    (3, 1), (-3, 1), (2, 3),  (-2, 3), (3, 2),  (-3, 2), (0, 4),  (4, 0),
    (1, 4), (-1, 4), (4, 1),  (-4, 1), (3, 3),  (-3, 3), (2, 4),  (-2, 4),
    (4, 2), (-4, 2), (0, 5),  (3, 4),  (-3, 4), (4, 3),  (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1),  (-5, 1), (2, 5),  (-2, 5), (5, 2),  (-5, 2),
    (4, 4), (-4, 4), (3, 5),  (-3, 5), (5, 3),  (-5, 3), (0, 6),  (6, 0),
    (1, 6), (-1, 6), (6, 1),  (-6, 1), (2, 6),  (-2, 6), (6, 2),  (-6, 2),
    (4, 5), (-4, 5), (5, 4),  (-5, 4), (3, 6),  (-3, 6), (6, 3),  (-6, 3),
    (0, 7), (7, 0),  (1, 7),  (-1, 7), (5, 5),  (-5, 5), (7, 1),  (-7, 1),
    (4, 6), (-4, 6), (6, 4),  (-6, 4), (2, 7),  (-2, 7), (7, 2),  (-7, 2),
    (3, 7), (-3, 7), (7, 3),  (-7, 3), (5, 6),  (-5, 6), (6, 5),  (-6, 5),
    (8, 0), (4, 7),  (-4, 7), (7, 4),  (-7, 4), (8, 1),  (8, 2),  (6, 6),
    (-6, 6), (8, 3), (5, 7),  (-5, 7), (7, 5),  (-7, 5), (8, 4),  (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5),  (7, 7),  (-7, 7), (8, 6),  (8, 7))

  private def planeCodeToDistance(xsize: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistanceMap(code - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------------- image stream

  /** One decoded sub-image or the main image: ARGB pixels packed as
    * Int (a<<24 | r<<16 | g<<8 | b).
    */
  private def decodeImageStream(br: BitReader, xsize: Int, ysize: Int,
                                isLevel0: Boolean,
                                transforms: java.util.ArrayList[Transform])
      : Array[Int] = {
    var w = xsize
    if (isLevel0) {
      // transforms, each type at most once
      var seen = 0
      while (br.bit() == 1) {
        if (br.bad) return null
        val ttype = br.read(2)
        if ((seen & (1 << ttype)) != 0) return null
        seen |= 1 << ttype
        val t = readTransform(br, ttype, w, ysize)
        if (t == null) return null
        transforms.add(t)
        w = t.newWidth(w)
      }
      if (br.bad) return null
    }
    // color cache
    var cacheBits = 0
    if (br.bit() == 1) {
      cacheBits = br.read(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    if (br.bad) return null
    // meta prefix codes (level0 only)
    var metaW = 0
    var metaBits = 0
    var meta: Array[Int] = null
    var numGroups = 1
    if (isLevel0 && br.bit() == 1) {
      metaBits = 2 + br.read(3)
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (ysize + (1 << metaBits) - 1) >> metaBits
      meta = decodeImageStream(br, metaW, metaH, isLevel0 = false, null)
      if (meta == null) return null
      var mx = 0
      while (mx < meta.length) {
        // group index packed in (red << 8) | green
        val g = ((meta(mx) >> 8) & 0xffff)
        if (g + 1 > numGroups) numGroups = g + 1
        mx += 1
      }
    }
    if (br.bad) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val groups = new Array[Array[PrefixCode]](numGroups)
    var gi = 0
    while (gi < numGroups) {
      val g = new Array[PrefixCode](5)
      g(0) = readPrefixCode(br, 256 + 24 + cacheSize) // green+len+cache
      g(1) = readPrefixCode(br, 256)                  // red
      g(2) = readPrefixCode(br, 256)                  // blue
      g(3) = readPrefixCode(br, 256)                  // alpha
      g(4) = readPrefixCode(br, 40)                   // distance
      if (g.exists(_ == null)) return null
      groups(gi) = g
      gi += 1
    }
    // pixel loop
    val n = w * ysize
    if (n <= 0 || n > (1 << 26)) return null
    val out = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    var pos = 0
    var x = 0
    var y = 0
    var group = groups(0)
    var lastMetaTile = -1
    while (pos < n) {
      if (meta != null) {
        val tile = (y >> metaBits) * metaW + (x >> metaBits)
        if (tile != lastMetaTile) {
          group = groups((meta(tile) >> 8) & 0xffff)
          lastMetaTile = tile
        }
      }
      val s = group(0).readSym(br)
      if (s < 0 || br.bad) return null
      if (s < 256) {
        val red = group(1).readSym(br)
        val blue = group(2).readSym(br)
        val alpha = group(3).readSym(br)
        if (red < 0 || blue < 0 || alpha < 0 || br.bad) return null
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = argb
        cacheInsert(argb)
        pos += 1; x += 1; if (x >= w) { x = 0; y += 1 }
      } else if (s < 256 + 24) {
        val length = lz77Value(br, s - 256)
        val dcode = group(4).readSym(br)
        if (dcode < 0 || br.bad) return null
        val dist = planeCodeToDistance(w, lz77Value(br, dcode))
        if (br.bad || dist > pos || pos + length > n) return null
        var k = 0
        while (k < length) {
          val argb = out(pos - dist)
          out(pos) = argb
          cacheInsert(argb)
          pos += 1; k += 1
        }
        x = pos % w; y = pos / w
        lastMetaTile = -1
      } else {
        if (cache == null) return null
        val idx = s - 256 - 24
        if (idx >= cacheSize) return null
        out(pos) = cache(idx)
        pos += 1; x += 1; if (x >= w) { x = 0; y += 1 }
      }
    }
    out
  }

  // --------------------------------------------------------- transforms

  private sealed trait Transform {
    def newWidth(w: Int): Int = w
    /** Invert in place / return the (possibly wider) pixel array. */
    def inverse(pixels: Array[Int], w: Int, h: Int): (Array[Int], Int)
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel modulo-256 sum
    val alphaAndGreen = (a & 0xff00ff00) + (b & 0xff00ff00)
    val redAndBlue = (a & 0x00ff00ff) + (b & 0x00ff00ff)
    (alphaAndGreen & 0xff00ff00) | (redAndBlue & 0x00ff00ff)
  }

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    def ch(sh: Int): Int = {
      val v = ((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff)
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    // ave = avg2(a, b) per channel; result = clamp(ave + (ave - b) / 2)
    def ch(sh: Int): Int = {
      val p = ((a >>> sh) & 0xff)
      val q = ((b >>> sh) & 0xff)
      val ave = (p + q) / 2
      val v = ave + (ave - q) / 2
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private final class PredictorTransform(bits: Int, image: Array[Int],
                                         tilesW: Int) extends Transform {
    def inverse(pixels: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var y = 0
      var pos = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val mode =
            if (x == 0 && y == 0) 0 // black (only ADD of 0xff000000)
            else if (y == 0) 1      // L
            else if (x == 0) 2      // T
            else (image((y >> bits) * tilesW + (x >> bits)) >> 8) & 0xff
          val l = if (x > 0) pixels(pos - 1) else 0
          val t = if (y > 0) pixels(pos - w) else 0
          // TL only feeds modes reachable when x>0 && y>0
          val tl = if (x > 0 && y > 0) pixels(pos - w - 1) else 0
          // TR reads CONTIGUOUSLY one past the previous row — for the
          // rightmost column that is the current row's (already
          // reconstructed) first pixel, the defined spec behavior
          val tr = if (y > 0) pixels(pos - w + 1) else 0
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) l
            else if (x == 0) t
            else mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => t
              case 3  => tr
              case 4  => tl
              case 5  => avg2(avg2(l, tr), t)
              case 6  => avg2(l, tl)
              case 7  => avg2(l, t)
              case 8  => avg2(tl, t)
              case 9  => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => // Select
                val pa = {
                  def d(sh: Int) = math.abs(((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
                  d(24) + d(16) + d(8) + d(0)
                }
                val pb = {
                  def d(sh: Int) = math.abs(((l >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
                  d(24) + d(16) + d(8) + d(0)
                }
                // Spec: pL = Manhattan(pred, L) = sum|T-TL| (= pa),
                // pT = Manhattan(pred, T) = sum|L-TL| (= pb); return L
                // only when STRICTLY closer — ties go to T (libwebp).
                if (pa < pb) l else t
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(avg2(l, t), tl)
              case _  => return (null, 0)
            }
          pixels(pos) = addPixels(pixels(pos), pred)
          pos += 1
          x += 1
        }
        y += 1
      }
      (pixels, w)
    }
  }

  private final class ColorTransform(bits: Int, image: Array[Int],
                                     tilesW: Int) extends Transform {
    // 3.5 fixed-point signed multiplier
    private def delta(t: Byte, c: Int): Int = (t.toInt * (c.toByte).toInt) >> 5
    def inverse(pixels: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var y = 0
      var pos = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // transform element channels: green_to_red rides the BLUE
          // byte, green_to_blue the GREEN byte, red_to_blue the RED
          val cx = image((y >> bits) * tilesW + (x >> bits))
          val g2r = (cx & 0xff).toByte
          val g2b = ((cx >> 8) & 0xff).toByte
          val r2b = ((cx >> 16) & 0xff).toByte
          val argb = pixels(pos)
          val green = (argb >> 8) & 0xff
          var red = (argb >> 16) & 0xff
          var blue = argb & 0xff
          red = (red + delta(g2r, green)) & 0xff
          blue = (blue + delta(g2b, green)) & 0xff
          blue = (blue + delta(r2b, red)) & 0xff
          pixels(pos) = (argb & 0xff00ff00) | (red << 16) | blue
          pos += 1
          x += 1
        }
        y += 1
      }
      (pixels, w)
    }
  }

  private object SubtractGreenTransform extends Transform {
    def inverse(pixels: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      var i = 0
      while (i < pixels.length) {
        val argb = pixels(i)
        val green = (argb >> 8) & 0xff
        val red = (((argb >> 16) & 0xff) + green) & 0xff
        val blue = ((argb & 0xff) + green) & 0xff
        pixels(i) = (argb & 0xff00ff00) | (red << 16) | blue
        i += 1
      }
      (pixels, w)
    }
  }

  private final class ColorIndexingTransform(palette: Array[Int],
                                             origWidth: Int)
      extends Transform {
    // palettes of <= 16 entries bundle several pixels per green byte
    private val widthBits =
      if (palette.length <= 2) 3
      else if (palette.length <= 4) 2
      else if (palette.length <= 16) 1
      else 0
    override def newWidth(w: Int): Int =
      (w + (1 << widthBits) - 1) >> widthBits
    def inverse(pixels: Array[Int], w: Int, h: Int): (Array[Int], Int) = {
      val outW = origWidth
      val out = new Array[Int](outW * h)
      val pixelsPerByte = 1 << widthBits
      val bitsPerPixel = 8 >> widthBits
      val mask = (1 << bitsPerPixel) - 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < outW) {
          val packed = pixels(y * w + (x >> widthBits))
          val green = (packed >> 8) & 0xff
          val idx =
            if (widthBits == 0) green
            else (green >> (bitsPerPixel * (x & (pixelsPerByte - 1)))) & mask
          out(y * outW + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      (out, outW)
    }
  }

  private def readTransform(br: BitReader, ttype: Int, w: Int,
                            h: Int): Transform = ttype match {
    case 0 => // PREDICTOR
      val bits = 2 + br.read(3)
      val tw = (w + (1 << bits) - 1) >> bits
      val th = (h + (1 << bits) - 1) >> bits
      val img = decodeImageStream(br, tw, th, isLevel0 = false, null)
      if (img == null) null else new PredictorTransform(bits, img, tw)
    case 1 => // COLOR
      val bits = 2 + br.read(3)
      val tw = (w + (1 << bits) - 1) >> bits
      val th = (h + (1 << bits) - 1) >> bits
      val img = decodeImageStream(br, tw, th, isLevel0 = false, null)
      if (img == null) null else new ColorTransform(bits, img, tw)
    case 2 => SubtractGreenTransform
    case 3 => // COLOR_INDEXING
      val numColors = br.read(8) + 1
      val img = decodeImageStream(br, numColors, 1, isLevel0 = false, null)
      if (img == null) null
      else {
        // palette entries are delta-coded component-wise
        var i = 1
        while (i < img.length) { img(i) = addPixels(img(i), img(i - 1)); i += 1 }
        new ColorIndexingTransform(img, w)
      }
    case _ => null
  }

  // ------------------------------------------------------------- decode

  /** FULL pixel decode of a VP8L (lossless WebP) stream to RGB
    * triplets: the RIFF walk finds the VP8L chunk, the 5-byte header
    * yields dims, then [[decodeImageStream]] + inverse transforms.
    * Alpha is dropped (composited as-is — the pixel family works in
    * RGB). Containers without a VP8L chunk (lossy VP8, VP8X wrappers)
    * fall through to [[Vp8Codec.decodeWebpLossy]]'s keyframe decoder.
    * Returns None for malformed bitstreams or images past the
    * allocation bound — the same never-fail contract as
    * [[PngCodec.decodePngPixels]].
    */
  def decodeWebpPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    // locate the VP8L chunk via the RIFF walk
    def ascii(off: Int, n: Int): String =
      if (bytes.length >= off + n) new String(bytes, off, n, "US-ASCII")
      else ""
    def u(i: Int): Int = bytes(i) & 0xff
    def u32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16)).toLong |
        (u(i + 3).toLong << 24)
    if (bytes.length < 12 || ascii(0, 4) != "RIFF" ||
      ascii(8, 4) != "WEBP") return None
    var off = 12L
    var chunkStart = -1
    var chunkLen = 0L
    while (chunkStart < 0 && off + 8 <= bytes.length) {
      val o = off.toInt
      val cc = ascii(o, 4)
      val size = u32(o + 4)
      if (off + 8 + size > bytes.length) return None
      if (cc == "VP8L") { chunkStart = o + 8; chunkLen = size }
      else off += 8 + size + (size & 1L)
    }
    if (chunkStart < 0 || chunkLen < 5) return decodeWebpLossy(bytes)
    if (u(chunkStart) != 0x2f) return None
    val br = new BitReader(bytes, chunkStart + 1)
    val wm1 = br.read(14)
    val hm1 = br.read(14)
    br.read(1) // alpha-is-used hint
    val version = br.read(3)
    if (br.bad || version != 0) return None
    val w = wm1 + 1
    val h = hm1 + 1
    if (w.toLong * h * 3 > (1L << 28)) return None
    val transforms = new java.util.ArrayList[Transform]()
    var pixels = decodeImageStream(br, w, h, isLevel0 = true, transforms)
    if (pixels == null) return None
    // invert in reverse signaling order
    var curW = w
    // compute the coded width after all transforms were applied
    // (COLOR_INDEXING narrows it)
    var i = 0
    while (i < transforms.size()) { curW = transforms.get(i).newWidth(curW); i += 1 }
    i = transforms.size() - 1
    while (i >= 0) {
      val (p2, w2) = transforms.get(i).inverse(pixels, curW, h)
      if (p2 == null) return None
      pixels = p2
      curW = w2
      i -= 1
    }
    if (curW != w || pixels.length != w * h) return None
    val rgb = new Array[Byte](w * h * 3)
    i = 0
    while (i < pixels.length) {
      val argb = pixels(i)
      rgb(i * 3) = ((argb >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((argb >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (argb & 0xff).toByte
      i += 1
    }
    Some((w, h, rgb))
  }

  // ------------------------------------------------------------- encode

  private final class BitWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nbits
      nbits += n
      while (nbits >= 8) {
        bos.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8
      }
    }
    /** prefix-code bits go MSB-of-code first */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((code >> i) & 1, 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (nbits > 0) { bos.write((acc & 0xff).toInt); acc = 0; nbits = 0 }
      bos.toByteArray
    }
  }

  /** Canonical Huffman lengths for a histogram (depth-limited to 15 by
    * construction scaling — fixture alphabets never get close), plus
    * the canonical code values matching [[PrefixCode]]'s assignment.
    */
  private[multimodal] def huffmanLengths(hist: Array[Long],
                                         maxLen: Int = 15): Array[Int] = {
    val n = hist.length
    val used = (0 until n).filter(hist(_) > 0)
    val lengths = new Array[Int](n)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    // simple package-free huffman via priority queue of (weight, node)
    case class Node(w: Long, syms: List[Int], depths: Map[Int, Int])
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(
      Ordering.by[Node, Long](_.w).reverse)
    used.foreach(s => pq.enqueue(Node(hist(s), List(s), Map(s -> 0))))
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      val depths = (a.depths.map { case (s, d) => s -> (d + 1) }) ++
        (b.depths.map { case (s, d) => s -> (d + 1) })
      pq.enqueue(Node(a.w + b.w, a.syms ++ b.syms, depths))
    }
    val d = pq.dequeue().depths
    if (d.values.max > maxLen) {
      // depth overflow (tight maxLen + skewed counts): flatten the
      // histogram and retry — converges to uniform, whose depth is
      // ceil(log2(used)) ≤ maxLen for every alphabet used here
      return huffmanLengths(hist.map(h => if (h > 0) (h + 1) / 2 else 0),
        maxLen)
    }
    d.foreach { case (s, l) => lengths(s) = l }
    lengths
  }

  private[multimodal] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = 15
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val firstCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      firstCode(l) = code
      code = (code + count(l)) << 1
      l += 1
    }
    val next = firstCode.clone()
    val codes = new Array[Int](lengths.length)
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** Emit one prefix code's description: simple form for <= 2 symbols,
    * else the code-length-coded normal form (each length emitted
    * individually — no repeats — under its own small huffman).
    */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size <= 2 && used.forall(_ < 256) &&
      used.forall(s => lengths(s) == 1) &&
      (used.size == 1 || used.forall(_ < 256))) {
      // simple code: 1 or 2 symbols of length 1 (the degenerate
      // 1-symbol case is written the same way)
      bw.write(1, 1)                       // simple
      bw.write(used.size - 1, 1)           // num symbols - 1
      bw.write(1, 1)                       // first symbol in 8 bits
      bw.write(used.head, 8)
      if (used.size == 2) bw.write(used(1), 8)
    } else {
      bw.write(0, 1) // normal
      // histogram of code-length symbols (no repeat codes used)
      val clHist = new Array[Long](19)
      lengths.foreach(l => clHist(l) += 1)
      val clLengths = huffmanLengths(clHist, maxLen = 7)
      val clCodes = canonicalCodes(clLengths)
      // number of entries of ClcOrder we must transmit
      var numCodeLengths = ClcOrder.length
      while (numCodeLengths > 4 &&
        clLengths(ClcOrder(numCodeLengths - 1)) == 0) numCodeLengths -= 1
      bw.write(numCodeLengths - 4, 4)
      var i = 0
      while (i < numCodeLengths) {
        bw.write(clLengths(ClcOrder(i)), 3); i += 1
      }
      bw.write(0, 1) // no max_symbol cap
      // Degenerate code-length code (one used symbol, e.g. every used
      // pixel symbol at the same length): the decoder's single-symbol
      // path reads ZERO bits per length symbol (PrefixCode.single), so
      // emitting clLengths(l)-bit codes here would desync the stream.
      if (clLengths.count(_ > 0) > 1)
        lengths.foreach { l => bw.writeCode(clCodes(l), clLengths(l)) }
    }
  }

  /** LZ77 prefix encode of a value 1..4096: returns
    * (code, extraBits, extraVal) inverting [[lz77Value]].
    */
  private def lz77Code(v: Int): (Int, Int, Int) =
    if (v <= 4) (v - 1, 0, 0)
    else {
      val vm = v - 1
      val b = 31 - Integer.numberOfLeadingZeros(vm)
      val second = (vm >> (b - 1)) & 1
      val extra = b - 1
      val offset = (2 + second) << extra
      (2 * b + second, extra, vm - offset)
    }

  /** Genuine minimal VP8L encoder: literals, color-cache hits and
    * (with `lz77`) backward references under real canonical prefix
    * codes, with optional SUBTRACT_GREEN. The LZ77 pass detects runs
    * at distance 1 (horizontal) and distance `width` (vertical) —
    * emitted through neighborhood distance codes 2 and 1 respectively,
    * so the decoder's 2D short-distance map is exercised, not just
    * direct distances. `argb` is packed (a<<24|r<<16|g<<8|b)
    * row-major.
    */
  def vp8lEncode(width: Int, height: Int, argb: Array[Int],
                 subtractGreen: Boolean = false,
                 cacheBits: Int = 0,
                 lz77: Boolean = false): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0x4000 &&
      height <= 0x4000)
    require(argb.length == width * height)
    require(cacheBits >= 0 && cacheBits <= 11)
    val bw = new BitWriter()
    bw.write(0x2f, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1) // no alpha hint
    bw.write(0, 3) // version
    val px = argb.clone()
    if (subtractGreen) {
      bw.write(1, 1)  // a transform follows
      bw.write(2, 2)  // SUBTRACT_GREEN
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        px(i) = (p & 0xff00ff00) | (r << 16) | b
        i += 1
      }
    }
    bw.write(0, 1) // no more transforms
    // color cache
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    if (cacheBits > 0) { bw.write(1, 1); bw.write(cacheBits, 4) }
    else bw.write(0, 1)
    bw.write(0, 1) // no meta prefix
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheValid =
      if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    def cacheIndexOf(p: Int): Int = (0x1e35a7bd * p) >>> (32 - cacheBits)
    def cacheInsert(p: Int): Unit =
      if (cache != null) {
        val ci = cacheIndexOf(p); cache(ci) = p; cacheValid(ci) = true
      }
    // tokenize: (kind, a, b) with kind 0 literal(pixel), 1 cache(idx),
    // 2 copy(len, distSym 0=vertical/1=horizontal)
    val tokKind = new Array[Byte](px.length)
    val tokA = new Array[Int](px.length)
    val tokB = new Array[Int](px.length)
    var nTok = 0
    val hG = new Array[Long](256 + 24 + cacheSize)
    val hR = new Array[Long](256)
    val hB = new Array[Long](256)
    val hA = new Array[Long](256)
    val hD = new Array[Long](40)
    var i = 0
    while (i < px.length) {
      var len1 = 0
      var lenW = 0
      if (lz77) {
        while (i >= 1 && len1 < 4096 && i + len1 < px.length &&
          px(i + len1) == px(i + len1 - 1)) len1 += 1
        while (i >= width && lenW < 4096 && i + lenW < px.length &&
          px(i + lenW) == px(i + lenW - width)) lenW += 1
      }
      val best = math.max(len1, lenW)
      if (lz77 && best >= 3) {
        val (len, dsym) = if (lenW >= len1) (lenW, 0) else (len1, 1)
        tokKind(nTok) = 2; tokA(nTok) = len; tokB(nTok) = dsym; nTok += 1
        val (lc, _, _) = lz77Code(len)
        hG(256 + lc) += 1
        hD(dsym) += 1
        var k = 0
        while (k < len) { cacheInsert(px(i + k)); k += 1 }
        i += len
      } else {
        val p = px(i)
        val ci = if (cacheSize > 0) cacheIndexOf(p) else 0
        if (cache != null && cacheValid(ci) && cache(ci) == p) {
          tokKind(nTok) = 1; tokA(nTok) = ci; nTok += 1
          hG(256 + 24 + ci) += 1
        } else {
          tokKind(nTok) = 0; tokA(nTok) = p; nTok += 1
          hG((p >> 8) & 0xff) += 1
          hR((p >> 16) & 0xff) += 1
          hB(p & 0xff) += 1
          hA((p >>> 24) & 0xff) += 1
          cacheInsert(p)
        }
        i += 1
      }
    }
    // every code needs at least one symbol for a well-formed stream
    if (hD.forall(_ == 0L)) hD(0) = 1
    if (hR.forall(_ == 0L)) hR(0) = 1
    if (hB.forall(_ == 0L)) hB(0) = 1
    if (hA.forall(_ == 0L)) hA(0xff) = 1
    val lG = huffmanLengths(hG)
    val lR = huffmanLengths(hR)
    val lB = huffmanLengths(hB)
    val lA = huffmanLengths(hA)
    val lD = huffmanLengths(hD)
    writePrefixCode(bw, lG)
    writePrefixCode(bw, lR)
    writePrefixCode(bw, lB)
    writePrefixCode(bw, lA)
    writePrefixCode(bw, lD)
    val cG = canonicalCodes(lG)
    val cR = canonicalCodes(lR)
    val cB = canonicalCodes(lB)
    val cA = canonicalCodes(lA)
    val cD = canonicalCodes(lD)
    // single-symbol codes cost zero bits — matches PrefixCode.single
    def emit(codes: Array[Int], lengths: Array[Int], total: Int,
             sym: Int): Unit =
      if (total > 1) bw.writeCode(codes(sym), lengths(sym))
    val nG = lG.count(_ > 0)
    val nR = lR.count(_ > 0)
    val nB = lB.count(_ > 0)
    val nA = lA.count(_ > 0)
    val nD = lD.count(_ > 0)
    i = 0
    while (i < nTok) {
      tokKind(i) match {
        case 0 =>
          val p = tokA(i)
          emit(cG, lG, nG, (p >> 8) & 0xff)
          emit(cR, lR, nR, (p >> 16) & 0xff)
          emit(cB, lB, nB, p & 0xff)
          emit(cA, lA, nA, (p >>> 24) & 0xff)
        case 1 =>
          emit(cG, lG, nG, 256 + 24 + tokA(i))
        case _ =>
          val (lc, lxb, lxv) = lz77Code(tokA(i))
          emit(cG, lG, nG, 256 + lc)
          if (lxb > 0) bw.write(lxv, lxb)
          emit(cD, lD, nD, tokB(i))
        // distance codes 0/1 decode via the neighborhood map to
        // (0,1)→width and (1,0)→1 — no extra bits
      }
      i += 1
    }
    val payload = bw.bytes()
    // RIFF/WEBP wrapper
    val riffSize = 4 + 8 + payload.length + (payload.length & 1)
    val out = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8L".getBytes("US-ASCII")).putInt(payload.length)
      .put(payload)
    out.array()
  }

  /** [[PngCodec.syntheticPngGradient]]'s WebP-lossless twin: the same
    * wrapped-gradient pixels through the VP8L entropy coder (with
    * SUBTRACT_GREEN exercised — r=g=b makes the residuals constant
    * zero in red/blue, a genuinely different entropy shape), so one
    * oracle formula replays PNG, GIF and WebP containers and the
    * cross-format near-dup join sees hamming-0 triples.
    */
  def syntheticWebpGradient(id: Long, width: Int, height: Int,
                            tweakOrigin: Boolean = false,
                            cacheBits: Int = 0): MediaBlob = {
    val px = new Array[Int](width * height)
    (0 until height).foreach { y =>
      (0 until width).foreach { x =>
        val g0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = if (tweakOrigin && x == 0 && y == 0) (g0 + 1) % 256
                else g0
        px(y * width + x) = (0xff << 24) | (g << 16) | (g << 8) | g
      }
    }
    MediaBlob(id, "image/webp",
      vp8lEncode(width, height, px, subtractGreen = true,
        cacheBits = cacheBits))
  }
}
