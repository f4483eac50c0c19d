package graft.multimodal

/** RFC 6386 VP8 (lossy WebP) intra-frame codec: full keyframe pixel
  * decode plus a fixture-grade encoder, completing the WebP story the
  * VP8L side ([[Vp8lCodec]]) started — lossy VP8 is the majority of
  * real-web WebP, and until now `decodeWebpPixels` rejected it.
  *
  * The decoder implements the published keyframe bitstream:
  *
  *  - the §7 boolean arithmetic coder (both directions — the encoder
  *    here is the RFC's own example algorithm re-expressed);
  *  - the uncompressed frame tag / start code / 14-bit dims, the
  *    first-partition feature headers (segmentation incl. per-segment
  *    quant/filter overrides, loop-filter deltas, up to 8 residual
  *    partitions, quantizer indices with the five deltas, coefficient
  *    probability updates, skip probability);
  *  - keyframe intra modes (16×16 DC/V/H/TM and B_PRED with all ten
  *    4×4 sub-modes, the above/left-conditioned keyframe mode trees);
  *  - §13 DCT token decoding: the 12-token coefficient tree with
  *    band/context-indexed probabilities, cat1-cat6 extra-bit tails,
  *    the no-EOB-after-zero rule, zigzag scan, and the left/above
  *    nonzero context propagation (incl. the skipped-MB Y2 rule);
  *  - §14 dequantization (the y2dc×2 / y2ac×155/100-floor-8 /
  *    uvdc-cap-132 factors) and the exact integer inverse DCT
  *    (20091/35468 multipliers) and inverse Walsh-Hadamard;
  *  - §12 intra prediction with the 127/129 edge fills and the
  *    top-edge above-right rule for rightmost subblocks;
  *  - the §15 loop filter, both simple and normal profiles, with
  *    interior-limit/HEV thresholds and sharpness scaling.
  *
  * The probability and quantizer data tables are RFC 6386's literal
  * arrays ([[Vp8DefaultProbs]]: §13.5 default token probabilities,
  * §13.4 update gates, §11.5 keyframe B-mode table, §14.1 dc/ac
  * quantizer lookups), so FOREIGN streams — real-web lossy WebP from
  * independent encoders — decode bit-exactly (Vp8Spec pins three
  * independently-encoded fixtures to their reference Y/U/V planes),
  * and streams the encoder here produces are interoperable in the
  * other direction. All of the surrounding machinery (bool coder,
  * trees, scan order, transforms, prediction, filters) is spec-exact.
  *
  * YUV→RGB matches [[JpegCodec.decodeJpegRgb]]'s full-range BT.601
  * (chroma-neutral planes decode to r=g=b=y exactly) with
  * nearest-neighbor chroma upsampling, so chroma-neutral VP8 fixtures
  * are pixel-identical to their PNG/GIF/VP8L gradients and the
  * perceptual-hash / near-dup / quality family treats all four
  * containers as one corpus.
  *
  * Reference behavioral analogue: crawl images are opaque blobs in
  * the reference (extract_utils.py:50-59); this codec is the lossy
  * half of the Spark-side pixel seam those blobs flow through.
  */
private[multimodal] trait Vp8Codec extends Serializable {

  // ------------------------------------------------------- bool coder

  /** §7.3 boolean decoder. Reads past the partition end are permitted
    * (value bits are zero-filled — real streams end mid-symbol) but
    * counted: more than two virtual bytes marks the stream bad, which
    * the frame decoder routes to None.
    */
  final class Vp8BoolDecoder(
      buf: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var overrun = 0
    private var range = 255
    private var value = { val a = next(); (a << 8) | next() }
    private var bitCount = 0
    def bad: Boolean = overrun > 2

    private def next(): Int =
      if (pos < end) { val b = buf(pos) & 0xff; pos += 1; b }
      else { overrun += 1; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val big = split << 8
      var ret = 0
      if (value >= big) { ret = 1; range -= split; value -= big }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      ret
    }

    /** unsigned literal, MSB first, each bit at probability 128 */
    def literal(n: Int): Int = {
      var v = 0
      var i = n
      while (i > 0) { v = (v << 1) | bool(128); i -= 1 }
      v
    }

    /** literal magnitude followed by a sign bit (1 = negative) */
    def signedLiteral(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    /** §8.2 tree read: `tree` holds pairs of branch targets; a value
      * <= 0 is the negated leaf. `probs(i >> 1)` gates node `i`.
      */
    def tree(tree: Array[Int], probs: Array[Int], startAt: Int = 0)
        : Int = {
      var i = tree(startAt + bool(probs(startAt >> 1)))
      while (i > 0) i = tree(i + bool(probs(i >> 1)))
      -i
    }
  }

  /** §7.2 boolean encoder — the RFC's example algorithm (output-byte
    * carry walk-back, 24-shift priming, 32-bit flush) over a growable
    * buffer.
    */
  final class Vp8BoolEncoder {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var range = 255
    private var bottom = 0L // low 32 bits live; carries detected pre-shift
    private var bitCount = 24

    private def carry(): Unit = {
      var q = out.length - 1
      while (q >= 0 && out(q) == -1) { out(q) = 0; q -= 1 }
      if (q >= 0) out(q) = (out(q) + 1).toByte
    }

    def bool(b: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (b != 0) {
        bottom += split
        // the interval invariant keeps bottom under 2^32 in the RFC's
        // uint32 form; with a Long we catch (and propagate) the
        // would-be-wrapped carry explicitly
        if ((bottom & 0x100000000L) != 0L) { carry(); bottom &= 0xffffffffL }
        range -= split
      } else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0L) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out += ((bottom >> 24) & 0xff).toByte
          bottom &= 0xffffffL
          bitCount = 8
        }
      }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }

    def signedLiteral(v: Int, n: Int): Unit = {
      literal(math.abs(v), n)
      bool(if (v < 0) 1 else 0, 128)
    }

    /** encode `leaf` by walking `tree`'s branch pair containing it */
    def tree(tree: Array[Int], probs: Array[Int], leaf: Int,
             startAt: Int = 0): Unit = {
      // collect the root→leaf branch decisions, then emit in order
      val path = Vp8Tables.treePath(tree, leaf, startAt)
      var i = 0
      while (i < path.length) {
        val (node, bit) = path(i)
        bool(bit, probs(node >> 1))
        i += 1
      }
    }

    def bytes(): Array[Byte] = {
      // flush: RFC's flush_bool_encoder — emit 32 more value bits
      var c = bitCount
      var v = bottom
      if ((v & (1L << (32 - c))) != 0L) carry()
      v = (v << (c & 7)) & 0xffffffffL
      c >>= 3
      while (c > 0) { v = (v << 8) & 0xffffffffL; c -= 1 }
      var k = 4
      while (k > 0) {
        out += ((v >> 24) & 0xff).toByte
        v = (v << 8) & 0xffffffffL
        k -= 1
      }
      out.toArray
    }
  }

  // ------------------------------------------------------- transforms

  /** §14.3 exact integer inverse DCT: input/output 16 values in
    * raster order, columns then rows, final (x+4)>>3 rounding.
    */
  def vp8Idct4x4(ip: Array[Int]): Array[Int] = {
    val c1 = 20091 // cospi8sqrt2 - 1, Q16
    val c2 = 35468 // sinpi8sqrt2, Q16
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = ip(i) + ip(i + 8)
      val b1 = ip(i) - ip(i + 8)
      val cc = ((ip(i + 4) * c2) >> 16) -
        (ip(i + 12) + ((ip(i + 12) * c1) >> 16))
      val dd = (ip(i + 4) + ((ip(i + 4) * c1) >> 16)) +
        ((ip(i + 12) * c2) >> 16)
      tmp(i) = a1 + dd
      tmp(i + 12) = a1 - dd
      tmp(i + 4) = b1 + cc
      tmp(i + 8) = b1 - cc
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 2)
      val b1 = tmp(o) - tmp(o + 2)
      val cc = ((tmp(o + 1) * c2) >> 16) -
        (tmp(o + 3) + ((tmp(o + 3) * c1) >> 16))
      val dd = (tmp(o + 1) + ((tmp(o + 1) * c1) >> 16)) +
        ((tmp(o + 3) * c2) >> 16)
      out(o) = (a1 + dd + 4) >> 3
      out(o + 3) = (a1 - dd + 4) >> 3
      out(o + 1) = (b1 + cc + 4) >> 3
      out(o + 2) = (b1 - cc + 4) >> 3
      i += 1
    }
    out
  }

  /** §14.4 inverse Walsh-Hadamard for the Y2 (luma DC) block */
  def vp8Iwht4x4(ip: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = ip(i) + ip(i + 12)
      val b1 = ip(i + 4) + ip(i + 8)
      val cc = ip(i + 4) - ip(i + 8)
      val dd = ip(i) - ip(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = cc + dd
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = dd - cc
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val cc = tmp(o + 1) - tmp(o + 2)
      val dd = tmp(o) - tmp(o + 3)
      out(o) = (a1 + b1 + 3) >> 3
      out(o + 1) = (cc + dd + 3) >> 3
      out(o + 2) = (a1 - b1 + 3) >> 3
      out(o + 3) = (dd - cc + 3) >> 3
      i += 1
    }
    out
  }

  // ------------------------------------------------- plane + predict

  /** Reconstruction plane (dims are MB-multiples; crop happens at RGB
    * conversion). Off-frame reads follow §12.2's edge fills: the row
    * above the frame is 127, the column left of the frame is 129
    * (above wins the shared corner), and reads past the right edge of
    * an in-frame row replicate that row's last pixel.
    */
  final class Vp8Plane(val w: Int, val h: Int) {
    val px = new Array[Int](w * h)
    def get(x: Int, y: Int): Int =
      if (y < 0) 127
      else if (x < 0) 129
      else if (x >= w) px(y * w + w - 1)
      else px(y * w + x)
    def set(x: Int, y: Int, v: Int): Unit = px(y * w + x) = v
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** whole-block DC/V/H/TM prediction into (bx, by, size) of `p` —
    * shared by the 16×16 luma and 8×8 chroma paths
    */
  def predictWhole(p: Vp8Plane, bx: Int, by: Int,
      size: Int, mode: Int, hasAbove: Boolean, hasLeft: Boolean): Unit = {
    import Vp8Tables._
    mode match {
      case DcPred =>
        var sum = 0
        var n = 0
        if (hasAbove) { var i = 0; while (i < size) { sum += p.get(bx + i, by - 1); i += 1 }; n += size }
        if (hasLeft) { var i = 0; while (i < size) { sum += p.get(bx - 1, by + i); i += 1 }; n += size }
        val dc = if (n == 0) 128 else (sum + n / 2) / n
        var y = 0
        while (y < size) { var x = 0; while (x < size) { p.set(bx + x, by + y, dc); x += 1 }; y += 1 }
      case VPred =>
        var y = 0
        while (y < size) { var x = 0; while (x < size) { p.set(bx + x, by + y, p.get(bx + x, by - 1)); x += 1 }; y += 1 }
      case HPred =>
        var y = 0
        while (y < size) {
          val l = p.get(bx - 1, by + y)
          var x = 0; while (x < size) { p.set(bx + x, by + y, l); x += 1 }
          y += 1
        }
      case TmPred =>
        val al = if (by == 0) 127 else p.get(bx - 1, by - 1)
        var y = 0
        while (y < size) {
          val l = p.get(bx - 1, by + y)
          var x = 0
          while (x < size) {
            p.set(bx + x, by + y, clamp255(l + p.get(bx + x, by - 1) - al))
            x += 1
          }
          y += 1
        }
      case other => throw new IllegalStateException(s"mode $other")
    }
  }

  /** §12.3 4×4 sub-block prediction. `ar` supplies the four
    * above-right pixels (rightmost-column sub-blocks must use the MB's
    * top-edge snapshot, not the in-progress reconstruction — the
    * caller passes the right source).
    */
  def predictSub(p: Vp8Plane, bx: Int, by: Int,
      mode: Int, ar: Array[Int]): Unit = {
    import Vp8Tables._
    // edge pixel names per the spec's convention: X = above-left,
    // A..H = above row (incl. above-right), I..L = left column
    val xx = if (by == 0) 127 else if (bx == 0) 129 else p.get(bx - 1, by - 1)
    val a = new Array[Int](8)
    var i = 0
    while (i < 4) { a(i) = p.get(bx + i, by - 1); i += 1 }
    while (i < 8) { a(i) = ar(i - 4); i += 1 }
    val l = new Array[Int](4)
    i = 0
    while (i < 4) { l(i) = p.get(bx - 1, by + i); i += 1 }
    val o = new Array[Int](16)
    def avg2(u: Int, v: Int) = (u + v + 1) >> 1
    def avg3(u: Int, v: Int, w: Int) = (u + 2 * v + w + 2) >> 2
    mode match {
      case BDc =>
        val dc = (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
        java.util.Arrays.fill(o, dc)
      case BTm =>
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { o(r * 4 + c) = clamp255(l(r) + a(c) - xx); c += 1 }; r += 1 }
      case BVe =>
        val row = Array(avg3(xx, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
        var r = 0
        while (r < 4) { System.arraycopy(row, 0, o, r * 4, 4); r += 1 }
      case BHe =>
        val col = Array(avg3(xx, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var r = 0
        while (r < 4) { java.util.Arrays.fill(o, r * 4, r * 4 + 4, col(r)); r += 1 }
      case BLd =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            o(r * 4 + c) =
              if (r + c == 6) avg3(a(6), a(7), a(7))
              else avg3(a(r + c), a(r + c + 1), a(r + c + 2))
            c += 1
          }
          r += 1
        }
      case BRd =>
        val e = Array(l(3), l(2), l(1), l(0), xx, a(0), a(1), a(2), a(3))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { o(r * 4 + c) = avg3(e(c - r + 3), e(c - r + 4), e(c - r + 5)); c += 1 }
          r += 1
        }
      case BVr =>
        o(0) = avg2(xx, a(0)); o(1) = avg2(a(0), a(1))
        o(2) = avg2(a(1), a(2)); o(3) = avg2(a(2), a(3))
        o(4) = avg3(l(0), xx, a(0)); o(5) = avg3(xx, a(0), a(1))
        o(6) = avg3(a(0), a(1), a(2)); o(7) = avg3(a(1), a(2), a(3))
        o(8) = avg3(xx, l(0), l(1)); o(9) = o(0); o(10) = o(1); o(11) = o(2)
        o(12) = avg3(l(0), l(1), l(2)); o(13) = o(4); o(14) = o(5); o(15) = o(6)
      case BVl =>
        o(0) = avg2(a(0), a(1)); o(1) = avg2(a(1), a(2))
        o(2) = avg2(a(2), a(3)); o(3) = avg2(a(3), a(4))
        o(4) = avg3(a(0), a(1), a(2)); o(5) = avg3(a(1), a(2), a(3))
        o(6) = avg3(a(2), a(3), a(4)); o(7) = avg3(a(3), a(4), a(5))
        o(8) = o(1); o(9) = o(2); o(10) = o(3)
        o(11) = avg3(a(4), a(5), a(6))
        o(12) = o(5); o(13) = o(6); o(14) = o(7)
        o(15) = avg3(a(5), a(6), a(7))
      case BHd =>
        o(0) = avg2(xx, l(0)); o(1) = avg3(l(0), xx, a(0))
        o(2) = avg3(xx, a(0), a(1)); o(3) = avg3(a(0), a(1), a(2))
        o(4) = avg2(l(0), l(1)); o(5) = avg3(xx, l(0), l(1))
        o(6) = o(0); o(7) = o(1)
        o(8) = avg2(l(1), l(2)); o(9) = avg3(l(0), l(1), l(2))
        o(10) = o(4); o(11) = o(5)
        o(12) = avg2(l(2), l(3)); o(13) = avg3(l(1), l(2), l(3))
        o(14) = o(8); o(15) = o(9)
      case BHu =>
        o(0) = avg2(l(0), l(1)); o(1) = avg3(l(0), l(1), l(2))
        o(2) = avg2(l(1), l(2)); o(3) = avg3(l(1), l(2), l(3))
        o(4) = o(2); o(5) = o(3)
        o(6) = avg2(l(2), l(3)); o(7) = avg3(l(2), l(3), l(3))
        o(8) = o(6); o(9) = o(7); o(10) = l(3); o(11) = l(3)
        o(12) = l(3); o(13) = l(3); o(14) = l(3); o(15) = l(3)
      case other => throw new IllegalStateException(s"bmode $other")
    }
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) { p.set(bx + c, by + r, o(r * 4 + c)); c += 1 }
      r += 1
    }
  }

  // ------------------------------------------------------ token layer

  /** §14.1 per-segment dequantization factors (the second-stage
    * factors are the spec's; the base lookups are RFC 6386 §14.1's
    * literal tables via [[Vp8Tables]])
    */
  final case class Vp8Quant(
      y1dc: Int, y1ac: Int, y2dc: Int, y2ac: Int, uvdc: Int, uvac: Int)

  def vp8QuantFactors(qi: Int, dY1dc: Int,
      dY2dc: Int, dY2ac: Int, dUvdc: Int, dUvac: Int): Vp8Quant = {
    import Vp8Tables._
    val y2acRaw = acQ(qi + dY2ac) * 155 / 100
    Vp8Quant(
      y1dc = dcQ(qi + dY1dc),
      y1ac = acQ(qi),
      y2dc = dcQ(qi + dY2dc) * 2,
      y2ac = if (y2acRaw < 8) 8 else y2acRaw,
      uvdc = { val v = dcQ(qi + dUvdc); if (v > 132) 132 else v },
      uvac = acQ(qi + dUvac))
  }

  /** §13.3 one block's token run: writes dequantized coefficients in
    * natural order into `out` and returns true iff any was nonzero.
    * `ctx0` is the left+above nonzero context; `firstPos` is 1 for Y
    * blocks of macroblocks with a Y2 block.
    */
  private[multimodal] def vp8DecodeCoeffs(td: Vp8BoolDecoder,
      probs: Array[Array[Array[Array[Int]]]], plane: Int, ctx0: Int,
      firstPos: Int, dqDC: Int, dqAC: Int, out: Array[Int]): Boolean = {
    import Vp8Tables._
    var pos = firstPos
    var ctx = ctx0
    var prevZero = false
    var nonzero = false
    var done = false
    while (!done && pos < 16) {
      val pr = probs(plane)(CoefBands(pos))(ctx)
      val tok = td.tree(CoefTree, pr, startAt = if (prevZero) 2 else 0)
      if (tok == TokEob) done = true
      else if (tok == TokZero) { prevZero = true; ctx = 0; pos += 1 }
      else {
        val v =
          if (tok <= TokFour) tok
          else {
            val ci = tok - TokCat1
            var extra = 0
            val cp = CatProbs(ci)
            var i = 0
            while (i < cp.length) { extra = (extra << 1) | td.bool(cp(i)); i += 1 }
            CatBases(ci) + extra
          }
        val signed = if (td.bool(128) == 1) -v else v
        out(Zigzag(pos)) = signed * (if (pos == 0) dqDC else dqAC)
        nonzero = true
        prevZero = false
        ctx = if (v == 1) 1 else 2
        pos += 1
      }
    }
    nonzero
  }

  // ----------------------------------------------------- frame decode

  final class Vp8Frame(val w: Int, val h: Int,
      val y: Vp8Plane, val u: Vp8Plane, val v: Vp8Plane)

  private val SegTree: Array[Int] = Array(2, 4, -0, -1, -2, -3)

  /** Decode one VP8 keyframe payload (the body of a "VP8 " chunk) to
    * YUV planes. None on anything malformed: non-keyframe, bad start
    * code, partition sizes past the buffer, bool-decoder overrun, or
    * dims past the allocation bound — a row property upstream, never
    * a task failure.
    */
  def decodeVp8Frame(bytes: Array[Byte], off: Int, len: Int)
      : Option[Vp8Frame] =
    try decodeVp8FrameImpl(bytes, off, len)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeVp8FrameImpl(bytes: Array[Byte], off: Int, len: Int)
      : Option[Vp8Frame] = {
    import Vp8Tables._
    if (len < 10) return None
    def u8(i: Int): Int = bytes(off + i) & 0xff
    val tag = u8(0) | (u8(1) << 8) | (u8(2) << 16)
    val keyframe = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val part1Size = tag >>> 5
    if (!keyframe || version > 3) return None
    if (u8(3) != 0x9d || u8(4) != 0x01 || u8(5) != 0x2a) return None
    val w = (u8(6) | (u8(7) << 8)) & 0x3fff
    val h = (u8(8) | (u8(9) << 8)) & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h * 3 > (1L << 28)) return None
    if (10L + part1Size > len) return None
    val d = new Vp8BoolDecoder(bytes, off + 10, off + 10 + part1Size)

    if (d.literal(1) != 0) return None // color space must be 0
    d.literal(1) // clamping type (decode is unaffected: we clamp)

    // §9.3 segmentation
    var segEnabled = false
    var segUpdateMap = false
    var segAbsolute = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array.fill(3)(255)
    if (d.literal(1) == 1) {
      segEnabled = true
      segUpdateMap = d.literal(1) == 1
      val updateData = d.literal(1) == 1
      if (updateData) {
        segAbsolute = d.literal(1) == 1
        var i = 0
        while (i < 4) {
          if (d.literal(1) == 1) segQuant(i) = d.signedLiteral(7)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (d.literal(1) == 1) segLf(i) = d.signedLiteral(6)
          i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (d.literal(1) == 1) segTreeProbs(i) = d.literal(8)
          i += 1
        }
      }
    }

    // §9.4 loop filter
    val simpleFilter = d.literal(1) == 1
    val filterLevel = d.literal(6)
    val sharpness = d.literal(3)
    var lfDeltaEnabled = false
    val refLfDeltas = new Array[Int](4)
    val modeLfDeltas = new Array[Int](4)
    if (d.literal(1) == 1) {
      lfDeltaEnabled = true
      if (d.literal(1) == 1) {
        var i = 0
        while (i < 4) {
          if (d.literal(1) == 1) refLfDeltas(i) = d.signedLiteral(6)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (d.literal(1) == 1) modeLfDeltas(i) = d.signedLiteral(6)
          i += 1
        }
      }
    }

    // §9.5 residual partitions
    val numParts = 1 << d.literal(2)
    val sizesAt = off + 10 + part1Size
    if (sizesAt + 3 * (numParts - 1) > off + len) return None
    val partStart = new Array[Int](numParts)
    val partEnd = new Array[Int](numParts)
    var cursor = sizesAt + 3 * (numParts - 1)
    var pi = 0
    while (pi < numParts) {
      val size =
        if (pi == numParts - 1) off + len - cursor
        else {
          val b = sizesAt + 3 * pi
          (bytes(b) & 0xff) | ((bytes(b + 1) & 0xff) << 8) |
            ((bytes(b + 2) & 0xff) << 16)
        }
      if (size < 0 || cursor + size > off + len) return None
      partStart(pi) = cursor
      partEnd(pi) = cursor + size
      cursor += size
      pi += 1
    }
    val tds = Array.tabulate(numParts)(i =>
      new Vp8BoolDecoder(bytes, partStart(i), partEnd(i)))

    // §9.6 quantizers
    val yacQi = d.literal(7)
    def delta(): Int = if (d.literal(1) == 1) d.signedLiteral(4) else 0
    val dY1dc = delta(); val dY2dc = delta(); val dY2ac = delta()
    val dUvdc = delta(); val dUvac = delta()
    def segQi(seg: Int): Int =
      if (!segEnabled) yacQi
      else if (segAbsolute) segQuant(seg)
      else yacQi + segQuant(seg)
    val quants = Array.tabulate(4)(s =>
      vp8QuantFactors(segQi(s), dY1dc, dY2dc, dY2ac, dUvdc, dUvac))

    d.literal(1) // refresh entropy probs (keyframe: state is per-frame)

    // §13.4 coefficient probability updates over the §13.5 defaults
    val probs = Array.tabulate(4, 8, 3, 11)((p, b, c, i) =>
      DefaultCoefProbs(p)(b)(c)(i))
    var p4 = 0
    while (p4 < 4) {
      var b8 = 0
      while (b8 < 8) {
        var c3 = 0
        while (c3 < 3) {
          var i11 = 0
          while (i11 < 11) {
            if (d.bool(CoefUpdateProb(p4)(b8)(c3)(i11)) == 1)
              probs(p4)(b8)(c3)(i11) = d.literal(8)
            i11 += 1
          }
          c3 += 1
        }
        b8 += 1
      }
      p4 += 1
    }

    val mbNoCoeffSkip = d.literal(1) == 1
    val probSkipFalse = if (mbNoCoeffSkip) d.literal(8) else 0
    if (d.bad) return None

    // ------------------------------------------------------ MB sweep
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val py = new Vp8Plane(mbW * 16, mbH * 16)
    val pu = new Vp8Plane(mbW * 8, mbH * 8)
    val pv = new Vp8Plane(mbW * 8, mbH * 8)

    // nonzero contexts (§13.3) and keyframe B-mode contexts (§11.3)
    val aboveY = new Array[Int](mbW * 4)
    val aboveU = new Array[Int](mbW * 2)
    val aboveV = new Array[Int](mbW * 2)
    val aboveY2 = new Array[Int](mbW)
    val aboveBMode = Array.fill(mbW * 4)(BDc)
    // per-MB filter inputs collected for the post-pass
    val mbLevels = new Array[Int](mbW * mbH)
    val mbInner = new Array[Boolean](mbW * mbH)

    val coeffs = Array.ofDim[Int](25, 16) // 0 = Y2, 1-16 Y, 17-20 U, 21-24 V
    val snapAR = new Array[Int](4)
    val subModes = new Array[Int](16)

    var mbY = 0
    while (mbY < mbH) {
      val td = tds(mbY % numParts)
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var leftY2 = 0
      val leftBMode = Array.fill(4)(BDc)
      var mbX = 0
      while (mbX < mbW) {
        // ---- modes (first partition)
        val segId =
          if (segEnabled && segUpdateMap) d.tree(SegTree, segTreeProbs)
          else 0
        val skip =
          if (mbNoCoeffSkip) d.bool(probSkipFalse) == 1 else false
        val ymode = d.tree(KfYModeTree, KfYModeProb)
        if (ymode == BPred) {
          var sb = 0
          while (sb < 16) {
            val r = sb / 4; val c = sb % 4
            val a = if (r == 0) aboveBMode(mbX * 4 + c) else subModes(sb - 4)
            val l = if (c == 0) leftBMode(r) else subModes(sb - 1)
            subModes(sb) = d.tree(BModeTree, KfBModeProb(a)(l))
            sb += 1
          }
        } else {
          // implicit sub-modes feed neighbor contexts (§11.3)
          val imp = ymode match {
            case DcPred => BDc
            case VPred  => BVe
            case HPred  => BHe
            case _      => BTm
          }
          java.util.Arrays.fill(subModes, imp)
        }
        val uvmode = d.tree(UvModeTree, KfUvModeProb)
        var c4 = 0
        while (c4 < 4) {
          aboveBMode(mbX * 4 + c4) = subModes(12 + c4)
          leftBMode(c4) = subModes(c4 * 4 + 3)
          c4 += 1
        }

        // ---- residual tokens (round-robin partition)
        val hasY2 = ymode != BPred
        val q = quants(segId)
        var j = 0
        while (j < 25) { java.util.Arrays.fill(coeffs(j), 0); j += 1 }
        var anyCoeffs = false
        if (!skip) {
          if (hasY2) {
            val nz = vp8DecodeCoeffs(td, probs, 1,
              aboveY2(mbX) + leftY2, 0, q.y2dc, q.y2ac, coeffs(0))
            aboveY2(mbX) = if (nz) 1 else 0
            leftY2 = aboveY2(mbX)
            anyCoeffs ||= nz
          }
          val yPlane = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val r = sb / 4; val c = sb % 4
            val nz = vp8DecodeCoeffs(td, probs, yPlane,
              aboveY(mbX * 4 + c) + leftY(r), yFirst,
              q.y1dc, q.y1ac, coeffs(1 + sb))
            aboveY(mbX * 4 + c) = if (nz) 1 else 0
            leftY(r) = aboveY(mbX * 4 + c)
            anyCoeffs ||= nz
            sb += 1
          }
          // §13.1 block order: all four U subblocks, then all four V
          var cb = 0
          while (cb < 4) {
            val r = cb / 2; val c = cb % 2
            val nzU = vp8DecodeCoeffs(td, probs, 2,
              aboveU(mbX * 2 + c) + leftU(r), 0, q.uvdc, q.uvac,
              coeffs(17 + cb))
            aboveU(mbX * 2 + c) = if (nzU) 1 else 0
            leftU(r) = aboveU(mbX * 2 + c)
            anyCoeffs ||= nzU
            cb += 1
          }
          cb = 0
          while (cb < 4) {
            val r = cb / 2; val c = cb % 2
            val nzV = vp8DecodeCoeffs(td, probs, 2,
              aboveV(mbX * 2 + c) + leftV(r), 0, q.uvdc, q.uvac,
              coeffs(21 + cb))
            aboveV(mbX * 2 + c) = if (nzV) 1 else 0
            leftV(r) = aboveV(mbX * 2 + c)
            anyCoeffs ||= nzV
            cb += 1
          }
        } else {
          // §13.1: a skipped MB zeroes its nonzero contexts, except
          // that B_PRED MBs (no Y2 block) leave the Y2 context alone
          var k = 0
          while (k < 4) { aboveY(mbX * 4 + k) = 0; leftY(k) = 0; k += 1 }
          k = 0
          while (k < 2) {
            aboveU(mbX * 2 + k) = 0; leftU(k) = 0
            aboveV(mbX * 2 + k) = 0; leftV(k) = 0
            k += 1
          }
          if (hasY2) { aboveY2(mbX) = 0; leftY2 = 0 }
        }
        if (td.bad || d.bad) return None

        // ---- reconstruction
        val bx = mbX * 16; val by = mbY * 16
        if (hasY2) {
          val y2 = vp8Iwht4x4(coeffs(0))
          var sb = 0
          while (sb < 16) { coeffs(1 + sb)(0) = y2(sb); sb += 1 }
          predictWhole(py, bx, by, 16, ymode, mbY > 0, mbX > 0)
          var r = 0
          while (r < 4) {
            var c = 0
            while (c < 4) {
              addResidual(py, bx + c * 4, by + r * 4, coeffs(1 + r * 4 + c))
              c += 1
            }
            r += 1
          }
        } else {
          // B_PRED: the rightmost sub-block column reads above-right
          // from the MB's top edge, never the in-progress pixels
          var i = 0
          while (i < 4) { snapAR(i) = py.get(bx + 16 + i, by - 1); i += 1 }
          var sb = 0
          while (sb < 16) {
            val r = sb / 4; val c = sb % 4
            val sx = bx + c * 4; val sy = by + r * 4
            val ar =
              if (c == 3) snapAR
              else Array(py.get(sx + 4, sy - 1), py.get(sx + 5, sy - 1),
                py.get(sx + 6, sy - 1), py.get(sx + 7, sy - 1))
            predictSub(py, sx, sy, subModes(sb), ar)
            addResidual(py, sx, sy, coeffs(1 + sb))
            sb += 1
          }
        }
        val cbx = mbX * 8; val cby = mbY * 8
        predictWhole(pu, cbx, cby, 8, uvmode, mbY > 0, mbX > 0)
        predictWhole(pv, cbx, cby, 8, uvmode, mbY > 0, mbX > 0)
        var cb = 0
        while (cb < 4) {
          val r = cb / 2; val c = cb % 2
          addResidual(pu, cbx + c * 4, cby + r * 4, coeffs(17 + cb))
          addResidual(pv, cbx + c * 4, cby + r * 4, coeffs(21 + cb))
          cb += 1
        }

        // ---- loop-filter inputs (§15.2 per-MB level)
        var lvl =
          if (!segEnabled) filterLevel
          else if (segAbsolute) segLf(segId)
          else filterLevel + segLf(segId)
        if (lfDeltaEnabled) {
          lvl += refLfDeltas(0) // keyframes: always the INTRA ref slot
          if (ymode == BPred) lvl += modeLfDeltas(0)
        }
        mbLevels(mbY * mbW + mbX) =
          if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
        mbInner(mbY * mbW + mbX) = !skip || ymode == BPred

        mbX += 1
      }
      mbY += 1
    }

    if (filterLevel > 0)
      vp8LoopFilter(py, pu, pv, mbW, mbH, mbLevels, mbInner,
        simpleFilter, sharpness)
    Some(new Vp8Frame(w, h, py, pu, pv))
  }

  // ------------------------------------------------------ loop filter

  private def sclamp(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  /** §15.3/15.4 normal-profile filter at one edge position. `i` is
    * q0's index into `px`, `s` the across-edge stride.
    */
  private def normalFilterOne(px: Array[Int], i: Int, s: Int,
      mbEdge: Boolean, interior: Int, edgeLimit: Int, hevT: Int): Unit = {
    val p3 = px(i - 4 * s); val p2 = px(i - 3 * s)
    val p1 = px(i - 2 * s); val p0 = px(i - s)
    val q0 = px(i); val q1 = px(i + s)
    val q2 = px(i + 2 * s); val q3 = px(i + 3 * s)
    def ad(a: Int, b: Int) = math.abs(a - b)
    val mask = ad(p3, p2) <= interior && ad(p2, p1) <= interior &&
      ad(p1, p0) <= interior && ad(q1, q0) <= interior &&
      ad(q2, q1) <= interior && ad(q3, q2) <= interior &&
      ad(p0, q0) * 2 + ad(p1, q1) / 2 <= edgeLimit
    if (!mask) return
    val hev = ad(p1, p0) > hevT || ad(q1, q0) > hevT
    val sp1 = p1 - 128; val sp0 = p0 - 128
    val sq0 = q0 - 128; val sq1 = q1 - 128
    if (!mbEdge || hev) {
      // common adjust: outer taps iff hev (always, at subblock edges
      // the !hev case then spreads to p1/q1)
      val a0 = sclamp((if (hev) sclamp(sp1 - sq1) else 0) + 3 * (sq0 - sp0))
      val f1 = sclamp(a0 + 4) >> 3
      val f2 = sclamp(a0 + 3) >> 3
      px(i) = sclamp(sq0 - f1) + 128
      px(i - s) = sclamp(sp0 + f2) + 128
      if (!hev) {
        val a1 = (f1 + 1) >> 1
        px(i + s) = sclamp(sq1 - a1) + 128
        px(i - 2 * s) = sclamp(sp1 + a1) + 128
      }
    } else {
      // macroblock edge, no high-edge-variance: the wide 27/18/9 taps
      val wv = sclamp(sclamp(sp1 - sq1) + 3 * (sq0 - sp0))
      var a = sclamp((27 * wv + 63) >> 7)
      px(i) = sclamp(sq0 - a) + 128
      px(i - s) = sclamp(sp0 + a) + 128
      a = sclamp((18 * wv + 63) >> 7)
      px(i + s) = sclamp(sq1 - a) + 128
      px(i - 2 * s) = sclamp(sp1 + a) + 128
      a = sclamp((9 * wv + 63) >> 7)
      px(i + 2 * s) = sclamp(q2 - 128 - a) + 128
      px(i - 3 * s) = sclamp(p2 - 128 + a) + 128
    }
  }

  /** §15.1 simple-profile filter (luma only, 2-tap neighborhood) */
  private def simpleFilterOne(px: Array[Int], i: Int, s: Int,
      edgeLimit: Int): Unit = {
    val p1 = px(i - 2 * s); val p0 = px(i - s)
    val q0 = px(i); val q1 = px(i + s)
    if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 > edgeLimit) return
    val a0 = sclamp(sclamp(p1 - 128 - (q1 - 128)) +
      3 * ((q0 - 128) - (p0 - 128)))
    val f1 = sclamp(a0 + 4) >> 3
    val f2 = sclamp(a0 + 3) >> 3
    px(i) = sclamp(q0 - 128 - f1) + 128
    px(i - s) = sclamp(p0 - 128 + f2) + 128
  }

  private def vp8LoopFilter(py: Vp8Plane, pu: Vp8Plane, pv: Vp8Plane,
      mbW: Int, mbH: Int, levels: Array[Int], inner: Array[Boolean],
      simple: Boolean, sharpness: Int): Unit = {
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val lvl = levels(mbY * mbW + mbX)
        if (lvl > 0) {
          var interior = lvl
          if (sharpness > 0) {
            interior >>= (if (sharpness > 4) 2 else 1)
            if (interior > 9 - sharpness) interior = 9 - sharpness
          }
          if (interior < 1) interior = 1
          val hevT = if (lvl >= 40) 2 else if (lvl >= 15) 1 else 0
          val mbE = (lvl + 2) * 2 + interior
          val subE = lvl * 2 + interior
          val doInner = inner(mbY * mbW + mbX)

          def edgesY(p: Vp8Plane, bx: Int, by: Int, size: Int): Unit = {
            val w = p.w
            // vertical MB edge, then inner verticals
            if (mbX > 0) {
              var r = 0
              while (r < size) {
                if (simple) simpleFilterOne(p.px, (by + r) * w + bx, 1, mbE)
                else normalFilterOne(p.px, (by + r) * w + bx, 1,
                  mbEdge = true, interior, mbE, hevT)
                r += 1
              }
            }
            if (doInner) {
              var e = 4
              while (e < size) {
                var r = 0
                while (r < size) {
                  if (simple)
                    simpleFilterOne(p.px, (by + r) * w + bx + e, 1, subE)
                  else normalFilterOne(p.px, (by + r) * w + bx + e, 1,
                    mbEdge = false, interior, subE, hevT)
                  r += 1
                }
                e += 4
              }
            }
            // horizontal MB edge, then inner horizontals
            if (mbY > 0) {
              var c = 0
              while (c < size) {
                if (simple) simpleFilterOne(p.px, by * w + bx + c, w, mbE)
                else normalFilterOne(p.px, by * w + bx + c, w,
                  mbEdge = true, interior, mbE, hevT)
                c += 1
              }
            }
            if (doInner) {
              var e = 4
              while (e < size) {
                var c = 0
                while (c < size) {
                  if (simple)
                    simpleFilterOne(p.px, (by + e) * w + bx + c, w, subE)
                  else normalFilterOne(p.px, (by + e) * w + bx + c, w,
                    mbEdge = false, interior, subE, hevT)
                  c += 1
                }
                e += 4
              }
            }
          }

          edgesY(py, mbX * 16, mbY * 16, 16)
          if (!simple) {
            edgesY(pu, mbX * 8, mbY * 8, 8)
            edgesY(pv, mbX * 8, mbY * 8, 8)
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  // -------------------------------------------------------- YUV → RGB

  /** Crop + convert with [[JpegCodec.decodeJpegRgb]]'s full-range
    * BT.601 rounding (chroma-neutral planes give r=g=b=y exactly);
    * nearest-neighbor 4:2:0 chroma upsampling.
    */
  def vp8FrameToRgb(f: Vp8Frame)
      : (Int, Int, Array[Byte]) = {
    val rgb = new Array[Byte](f.w * f.h * 3)
    var y = 0
    while (y < f.h) {
      var x = 0
      while (x < f.w) {
        val yy = f.y.px(y * f.y.w + x)
        val cb = f.u.px((y >> 1) * f.u.w + (x >> 1)) - 128
        val cr = f.v.px((y >> 1) * f.v.w + (x >> 1)) - 128
        val o = (y * f.w + x) * 3
        rgb(o) = clamp255(Math.round(yy + 1.402 * cr).toInt).toByte
        rgb(o + 1) = clamp255(
          Math.round(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        rgb(o + 2) = clamp255(Math.round(yy + 1.772 * cb).toInt).toByte
        x += 1
      }
      y += 1
    }
    (f.w, f.h, rgb)
  }

  /** RIFF walk for the lossy chunk: the [[Vp8lCodec.decodeWebpPixels]]
    * fallback once no VP8L chunk is present (incl. inside VP8X
    * wrappers).
    */
  def decodeWebpLossy(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] = {
    if (bytes.length < 12) return None
    def ascii(off: Int, n: Int): String =
      if (bytes.length >= off + n) new String(bytes, off, n, "US-ASCII")
      else ""
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WEBP") return None
    var off = 12L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val cc = ascii(o, 4)
      val size = ((bytes(o + 4) & 0xff) | ((bytes(o + 5) & 0xff) << 8) |
        ((bytes(o + 6) & 0xff) << 16)).toLong |
        ((bytes(o + 7) & 0xff).toLong << 24)
      if (off + 8 + size > bytes.length) return None
      if (cc == "VP8 ")
        return decodeVp8Frame(bytes, o + 8, size.toInt)
          .map(vp8FrameToRgb)
      off += 8 + size + (size & 1L)
    }
    None
  }

  private def addResidual(p: Vp8Plane, bx: Int, by: Int,
      coeffs: Array[Int]): Unit = {
    var allZero = true
    var i = 0
    while (allZero && i < 16) { allZero = coeffs(i) == 0; i += 1 }
    if (allZero) return
    val res = vp8Idct4x4(coeffs)
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        p.set(bx + c, by + r,
          clamp255(p.get(bx + c, by + r) + res(r * 4 + c)))
        c += 1
      }
      r += 1
    }
  }

  // ----------------------------------------------------------- encode

  /** One macroblock of the encoder's input: the intra modes plus
    * QUANTIZED coefficient levels in natural (raster) order — the
    * decoder multiplies by the dequant factors, so levels are what a
    * real encoder's quantizer would emit. Null level arrays mean
    * all-zero. `subModes` is read only when `ymode == BPred`.
    */
  final case class Vp8MbPlan(
      ymode: Int, uvmode: Int,
      subModes: Array[Int] = null,
      y2: Array[Int] = null,
      y: Array[Array[Int]] = null,
      u: Array[Array[Int]] = null,
      v: Array[Array[Int]] = null)

  /** Fixture-grade VP8 keyframe encoder: one residual partition, no
    * segmentation, no probability updates, `mb_no_coeff_skip` on
    * (all-zero MBs are skipped). Emits a conforming stream through
    * the same trees/contexts the decoder walks, so decode tests
    * exercise the full §13 entropy path. Returns the "VP8 " chunk
    * body (frame tag + start code + both partitions).
    */
  def vp8Encode(width: Int, height: Int, qIndex: Int,
      plan: (Int, Int) => Vp8MbPlan, filterLevel: Int = 0,
      simpleFilter: Boolean = false, sharpness: Int = 0,
      tokenPartitions: Int = 1,
      segmentQi: Array[Int] = null,
      segmentOf: (Int, Int) => Int = null): Array[Byte] = {
    import Vp8Tables._
    require(width >= 1 && height >= 1 && width <= 0x3fff &&
      height <= 0x3fff, "dims must fit the 14-bit fields")
    require(qIndex >= 0 && qIndex <= 127, "qIndex is a 7-bit field")
    require(Set(1, 2, 4, 8)(tokenPartitions), "1/2/4/8 partitions")
    require((segmentQi == null) == (segmentOf == null),
      "segment features travel together")
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val segmented = segmentQi != null
    val segTreeProbs = Array(100, 140, 200)

    val e1 = new Vp8BoolEncoder // feature/mode partition
    val tokenEncs =
      Array.fill(tokenPartitions)(new Vp8BoolEncoder)
    var e2 = tokenEncs(0) // the current MB row's token partition
    e1.literal(0, 1) // color space
    e1.literal(0, 1) // clamping
    e1.literal(if (segmented) 1 else 0, 1)
    if (segmented) {
      // §9.3: update map + absolute per-segment quantizer values
      e1.literal(1, 1) // update_mb_segmentation_map
      e1.literal(1, 1) // update_segment_feature_data
      e1.literal(1, 1) // absolute values
      var i = 0
      while (i < 4) { e1.literal(1, 1); e1.signedLiteral(segmentQi(i), 7); i += 1 }
      i = 0
      while (i < 4) { e1.literal(0, 1); i += 1 } // no lf overrides
      i = 0
      while (i < 3) { e1.literal(1, 1); e1.literal(segTreeProbs(i), 8); i += 1 }
    }
    e1.literal(if (simpleFilter) 1 else 0, 1)
    e1.literal(filterLevel, 6)
    e1.literal(sharpness, 3)
    e1.literal(0, 1) // lf deltas off
    e1.literal(Integer.numberOfTrailingZeros(tokenPartitions), 2)
    e1.literal(qIndex, 7)
    var i = 0
    while (i < 5) { e1.literal(0, 1); i += 1 } // no quant deltas
    e1.literal(1, 1) // refresh entropy
    i = 0
    while (i < 4 * 8 * 3 * 11) {
      e1.bool(0, Vp8DefaultProbs.CoefUpdateProbsFlat(i)); i += 1
    }
    val probSkipFalse = 128
    e1.literal(1, 1) // mb_no_coeff_skip
    e1.literal(probSkipFalse, 8)

    val probs = DefaultCoefProbs
    val aboveY = new Array[Int](mbW * 4)
    val aboveU = new Array[Int](mbW * 2)
    val aboveV = new Array[Int](mbW * 2)
    val aboveY2 = new Array[Int](mbW)
    val aboveBMode = Array.fill(mbW * 4)(BDc)

    def allZero(levels: Array[Int]): Boolean =
      levels == null || levels.forall(_ == 0)

    /** §13 token writer for one block; mirrors [[vp8DecodeCoeffs]] */
    def writeBlock(plane: Int, ctx0: Int, firstPos: Int,
        levels: Array[Int]): Int = {
      var lastNZ = -1
      var pos = firstPos
      while (pos < 16) {
        if (levels != null && levels(Zigzag(pos)) != 0) lastNZ = pos
        pos += 1
      }
      var ctx = ctx0
      var prevZero = false
      pos = firstPos
      while (pos <= lastNZ) {
        val v = levels(Zigzag(pos))
        val mag = math.abs(v)
        val pr = probs(plane)(CoefBands(pos))(ctx)
        val startAt = if (prevZero) 2 else 0
        if (mag == 0) {
          e2.tree(CoefTree, pr, TokZero, startAt)
          prevZero = true; ctx = 0
        } else {
          require(mag <= 2114, "level past the cat6 range")
          val tok =
            if (mag <= 4) mag
            else {
              // smallest cat whose base range contains mag
              var k = 0
              while (k < 5 && mag >= CatBases(k + 1)) k += 1
              TokCat1 + k
            }
          e2.tree(CoefTree, pr, tok, startAt)
          if (tok >= TokCat1) {
            val ci = tok - TokCat1
            val extra = mag - CatBases(ci)
            val cp = CatProbs(ci)
            var k = 0
            while (k < cp.length) {
              e2.bool((extra >> (cp.length - 1 - k)) & 1, cp(k))
              k += 1
            }
          }
          e2.bool(if (v < 0) 1 else 0, 128)
          prevZero = false
          ctx = if (mag == 1) 1 else 2
        }
        pos += 1
      }
      if (lastNZ < 15) {
        val pos2 = if (lastNZ < firstPos) firstPos else lastNZ + 1
        e2.tree(CoefTree, probs(plane)(CoefBands(pos2))(ctx), TokEob, 0)
      }
      if (lastNZ >= firstPos) 1 else 0
    }

    val subModes = new Array[Int](16)
    var mbY = 0
    while (mbY < mbH) {
      e2 = tokenEncs(mbY % tokenPartitions)
      val leftY = new Array[Int](4)
      val leftU = new Array[Int](2)
      val leftV = new Array[Int](2)
      var leftY2 = 0
      val leftBMode = Array.fill(4)(BDc)
      var mbX = 0
      while (mbX < mbW) {
        val mp = plan(mbX, mbY)
        val hasY2 = mp.ymode != BPred
        val skip = allZero(mp.y2) &&
          (mp.y == null || mp.y.forall(allZero)) &&
          (mp.u == null || mp.u.forall(allZero)) &&
          (mp.v == null || mp.v.forall(allZero))

        // ---- modes
        if (segmented)
          e1.tree(SegTree, segTreeProbs, segmentOf(mbX, mbY))
        e1.bool(if (skip) 1 else 0, probSkipFalse)
        e1.tree(KfYModeTree, KfYModeProb, mp.ymode)
        if (mp.ymode == BPred) {
          var sb = 0
          while (sb < 16) {
            val r = sb / 4; val c = sb % 4
            val a = if (r == 0) aboveBMode(mbX * 4 + c) else subModes(sb - 4)
            val l = if (c == 0) leftBMode(r) else subModes(sb - 1)
            subModes(sb) = mp.subModes(sb)
            e1.tree(BModeTree, KfBModeProb(a)(l), subModes(sb))
            sb += 1
          }
        } else {
          val imp = mp.ymode match {
            case DcPred => BDc
            case VPred  => BVe
            case HPred  => BHe
            case _      => BTm
          }
          java.util.Arrays.fill(subModes, imp)
        }
        e1.tree(UvModeTree, KfUvModeProb, mp.uvmode)
        var c4 = 0
        while (c4 < 4) {
          aboveBMode(mbX * 4 + c4) = subModes(12 + c4)
          leftBMode(c4) = subModes(c4 * 4 + 3)
          c4 += 1
        }

        // ---- tokens / context bookkeeping (mirrors the decoder)
        if (!skip) {
          if (hasY2) {
            val nz = writeBlock(1, aboveY2(mbX) + leftY2, 0, mp.y2)
            aboveY2(mbX) = nz; leftY2 = nz
          }
          val yPlane = if (hasY2) 0 else 3
          val yFirst = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val r = sb / 4; val c = sb % 4
            val levels = if (mp.y == null) null else mp.y(sb)
            val nz = writeBlock(yPlane,
              aboveY(mbX * 4 + c) + leftY(r), yFirst, levels)
            aboveY(mbX * 4 + c) = nz; leftY(r) = nz
            sb += 1
          }
          // §13.1 block order: all four U subblocks, then all four V
          var cb = 0
          while (cb < 4) {
            val r = cb / 2; val c = cb % 2
            val lu = if (mp.u == null) null else mp.u(cb)
            val nzU = writeBlock(2, aboveU(mbX * 2 + c) + leftU(r), 0, lu)
            aboveU(mbX * 2 + c) = nzU; leftU(r) = nzU
            cb += 1
          }
          cb = 0
          while (cb < 4) {
            val r = cb / 2; val c = cb % 2
            val lv = if (mp.v == null) null else mp.v(cb)
            val nzV = writeBlock(2, aboveV(mbX * 2 + c) + leftV(r), 0, lv)
            aboveV(mbX * 2 + c) = nzV; leftV(r) = nzV
            cb += 1
          }
        } else {
          var k = 0
          while (k < 4) { aboveY(mbX * 4 + k) = 0; leftY(k) = 0; k += 1 }
          k = 0
          while (k < 2) {
            aboveU(mbX * 2 + k) = 0; leftU(k) = 0
            aboveV(mbX * 2 + k) = 0; leftV(k) = 0
            k += 1
          }
          if (hasY2) { aboveY2(mbX) = 0; leftY2 = 0 }
        }
        mbX += 1
      }
      mbY += 1
    }

    val part1 = e1.bytes()
    val tokenBytes = tokenEncs.map(_.bytes())
    val out = new java.io.ByteArrayOutputStream()
    val tag = (1 << 4) | (part1.length << 5) // keyframe, v0, show=1
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff)
    out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(width & 0xff); out.write((width >> 8) & 0x3f)
    out.write(height & 0xff); out.write((height >> 8) & 0x3f)
    out.write(part1)
    // §9.5: sizes of all but the last token partition, 3-byte LE
    tokenBytes.dropRight(1).foreach { tb =>
      out.write(tb.length & 0xff)
      out.write((tb.length >> 8) & 0xff)
      out.write((tb.length >> 16) & 0xff)
    }
    tokenBytes.foreach(out.write)
    out.toByteArray
  }

  /** Wrap a VP8 frame payload in a RIFF/WEBP container */
  def webpWrapVp8(frame: Array[Byte]): Array[Byte] = {
    val padded = frame.length + (frame.length & 1)
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + padded)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8 ".getBytes("US-ASCII")).putInt(frame.length).put(frame)
    bb.array()
  }

  /** The per-MB luma offset of [[syntheticWebpLossyFlat]]'s plan —
    * shared with its closed-form pixel expectation (and the q-entry's
    * SQL oracle, which replays the same formula)
    */
  def lossyMbOffset(id: Long, mx: Int, my: Int): Int =
    (((id * 7 + mx * 5 + my * 11) % 9).toInt + 9) % 9 - 4

  /** Deterministic lossy-WebP fixture with EXACTLY replayable pixels:
    * flat macroblocks whose values chain through DC/V/H prediction
    * plus a per-MB Y2-DC offset. At qIndex 0 the §14.1 quantizers give
    * y2dc = 8 (dc_qlookup(0) = 4, doubled), and a Y2 DC level of 8·o reconstructs (per §14.4 then
    * §14.3 DC paths) to a uniform luma offset of exactly o — so the
    * decoded image is `y(x,y) = 128 + Σ offsets along the (0,0)→
    * (0,my)→(mx,my) prediction path`, chroma exactly 128 (r=g=b=y),
    * no clamping (offsets are ±4 over ≤5 MBs). Dims must be multiples
    * of 16.
    */
  def syntheticWebpLossyFlat(id: Long, width: Int, height: Int)
      : MediaBlob = {
    import Vp8Tables._
    require(width % 16 == 0 && height % 16 == 0, "MB-aligned dims")
    val frame = vp8Encode(width, height, qIndex = 0, plan = { (mx, my) =>
      val o = lossyMbOffset(id, mx, my)
      val ymode =
        if (mx == 0 && my == 0) DcPred else if (mx == 0) VPred else HPred
      val y2 = if (o == 0) null else {
        val a = new Array[Int](16); a(0) = 8 * o; a
      }
      Vp8MbPlan(ymode = ymode, uvmode = DcPred, y2 = y2)
    })
    MediaBlob(id, "image/webp", webpWrapVp8(frame))
  }

  /** [[syntheticWebpLossyFlat]]'s decoded luma, closed form */
  def lossyFlatPixel(id: Long, x: Int, y: Int): Int = {
    val mx = x / 16; val my = y / 16
    var v = 128
    var j = 0
    while (j <= my) { v += lossyMbOffset(id, 0, j); j += 1 }
    var i2 = 1
    while (i2 <= mx) { v += lossyMbOffset(id, i2, my); i2 += 1 }
    v
  }
}

/** Trees, scan orders and probability tables for [[Vp8Codec]] —
  * everything marked "§" is the RFC 6386 structure verbatim;
  * everything marked SEAM is a repo-defined deterministic table (see
  * the trait doc for why).
  */
object Vp8Tables {
  // §11.2 intra y modes (DC..TM as 0..3; B_PRED = 4); keyframe tree
  val DcPred = 0; val VPred = 1; val HPred = 2; val TmPred = 3
  val BPred = 4
  val KfYModeTree: Array[Int] =
    Array(-BPred, 2, 4, 6, -DcPred, -VPred, -HPred, -TmPred)
  val KfYModeProb: Array[Int] = Array(145, 156, 163, 128)

  // §11.2 chroma mode tree (DC/V/H/TM)
  val UvModeTree: Array[Int] = Array(-DcPred, 2, -VPred, 4, -HPred, -TmPred)
  val KfUvModeProb: Array[Int] = Array(142, 114, 183)

  // §11.2 the ten 4×4 sub-block modes and their tree
  val BDc = 0; val BTm = 1; val BVe = 2; val BHe = 3; val BLd = 4
  val BRd = 5; val BVr = 6; val BVl = 7; val BHd = 8; val BHu = 9
  val BModeTree: Array[Int] = Array(
    -BDc, 2,
    -BTm, 4,
    -BVe, 6,
    8, 12,
    -BHe, 10,
    -BRd, -BVr,
    -BLd, 14,
    -BVl, 16,
    -BHd, -BHu)

  /** §11.5 keyframe B-mode probabilities, indexed [above][left][9] —
    * RFC 6386's literal 10×10×9 table ([[Vp8DefaultProbs]]). The flat
    * storage carries rows in the source's B-mode numbering, which
    * renumbers the four diagonal modes relative to the spec's enum
    * (RD=4, VR=5, LD=6 vs the spec's LD=4, RD=5, VR=6); [[BModeRowIdx]]
    * converts spec indices to storage rows. The 9 node probabilities
    * per row are tree-positional and identical in both numberings
    * (same tree shape), so only the row lookup is remapped — pinned
    * end-to-end by Vp8Spec's foreign fixtures.
    */
  private val BModeRowIdx: Array[Int] =
    Array(0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
  val KfBModeProb: Array[Array[Array[Int]]] =
    Array.tabulate(10, 10, 9) { (a, l, i) =>
      Vp8DefaultProbs.KfBModeProbFlat(
        (BModeRowIdx(a) * 10 + BModeRowIdx(l)) * 9 + i)
    }

  // §13.2 coefficient token tree: EOB, 0..4, cat1..cat6
  val TokZero = 0; val TokOne = 1; val TokTwo = 2; val TokThree = 3
  val TokFour = 4; val TokCat1 = 5; val TokCat2 = 6; val TokCat3 = 7
  val TokCat4 = 8; val TokCat5 = 9; val TokCat6 = 10; val TokEob = 11
  val CoefTree: Array[Int] = Array(
    -TokEob, 2,
    -TokZero, 4,
    -TokOne, 6,
    8, 12,
    -TokTwo, 10,
    -TokThree, -TokFour,
    14, 16,
    -TokCat1, -TokCat2,
    18, 20,
    -TokCat3, -TokCat4,
    -TokCat5, -TokCat6)

  // §13.2 cat extra-bit probabilities and bases (spec constants)
  val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  val CatBases: Array[Int] = Array(5, 7, 11, 19, 35, 67)

  // §13.3 coefficient-position → probability band; §14.3 zigzag
  val CoefBands: Array[Int] =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  val Zigzag: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** §13.5 default token probabilities [plane 4][band 8][ctx 3][11] —
    * RFC 6386's literal 1056-entry table ([[Vp8DefaultProbs]]).
    * Shared by encoder and decoder, so repo-encoded streams remain
    * self-consistent AND interoperable with foreign decoders.
    */
  val DefaultCoefProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (p, b, c, i) =>
      Vp8DefaultProbs.CoefProbsFlat(((p * 8 + b) * 3 + c) * 11 + i)
    }

  /** §13.4 update gates for the per-position probability rewrite —
    * RFC 6386's literal second 1056-entry table, same shape and
    * iteration order as [[DefaultCoefProbs]]. Every one of the 1056
    * flags is arithmetic-decoded with its own gate probability, so a
    * single wrong entry desynchronizes the whole first partition —
    * Vp8Spec's foreign fixtures pin all of them.
    */
  val CoefUpdateProb: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (p, b, c, i) =>
      Vp8DefaultProbs.CoefUpdateProbsFlat(((p * 8 + b) * 3 + c) * 11 + i)
    }

  /** §14.1 quantizer lookups — RFC 6386's literal 128-entry dc/ac
    * tables (dc ends 157, ac ends 284); the ×2 / ×155/100 (floor 8) /
    * cap-132 second-stage factors at the call site ARE the spec's.
    */
  def dcQ(index: Int): Int = Vp8DefaultProbs.DcQLookup(clampQ(index))
  def acQ(index: Int): Int = Vp8DefaultProbs.AcQLookup(clampQ(index))
  private def clampQ(i: Int): Int = if (i < 0) 0 else if (i > 127) 127 else i

  /** root→leaf branch list for the encoder's tree writer */
  def treePath(tree: Array[Int], leaf: Int, startAt: Int)
      : Array[(Int, Int)] = {
    def dfs(node: Int, acc: List[(Int, Int)]): Option[List[(Int, Int)]] = {
      var b = 0
      while (b < 2) {
        val t = tree(node + b)
        if (t <= 0) { if (-t == leaf) return Some(((node, b)) :: acc) }
        else dfs(t, ((node, b)) :: acc) match {
          case s: Some[_] => return s
          case None =>
        }
        b += 1
      }
      None
    }
    dfs(startAt, Nil).map(_.reverse.toArray)
      .getOrElse(throw new IllegalArgumentException(s"leaf $leaf"))
  }
}
