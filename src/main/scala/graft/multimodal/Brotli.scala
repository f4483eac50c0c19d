package graft.multimodal

/** Brotli (RFC 7932) decompression + a genuine minimal encoder.
  *
  * `Content-Encoding: br` is the second-most-common encoding on the
  * modern web after gzip; a WET/WARC ingest that cannot inflate it
  * drops a double-digit percent of crawl responses (reference blob
  * analogue: briefly's s3_io_manager.py:24-50 gz handling). No brotli
  * implementation ships on this classpath (commons-compress and netty
  * carry only wrappers over absent native/dec jars), so this is an
  * original, bounded implementation of the published format:
  *
  *  - stream header (WBITS), meta-block framing: uncompressed blocks,
  *    metadata-skip blocks, empty-last blocks, compressed blocks;
  *  - prefix codes in both simple (1-4 symbol, with the tree-select
  *    shapes and the spec's symbol-sorting rules) and complex form
  *    (the fixed code-length-code-length code, 16/17 repeat symbols
  *    with brotli's COMPOUNDING repeat counts, 32768-space-scaled
  *    termination);
  *  - block-type switching for all three categories (type/count code
  *    pairs, the 26-symbol block-count alphabet, the 2-entry type
  *    ring with its 0/1 special symbols);
  *  - context modeling: all four literal context modes (LSB6, MSB6,
  *    UTF8, Signed via the spec's lookup tables) and the two-bit copy
  *    -length distance contexts, with RLE+IMTF-coded context maps;
  *  - the command loop: 704-symbol insert&copy alphabet, implicit
  *    distance-zero commands, the four-slot distance ring buffer
  *    (16/15/11/4 initial state, code-0 non-push rule), direct and
  *    postfix-coded distances, overlapping window copies;
  *  - the STATIC DICTIONARY: all 13,504 words (the 122,784-byte table
  *    of RFC 7932 Appendix A, shipped as a classpath resource and
  *    digest-pinned) with the full 121-transform table (omit-first/
  *    omit-last cuts, ferment-first/all uppercasing incl. the UTF-8
  *    multi-byte rules, prefix/suffix decoration).
  *
  * Malformed/truncated streams and the bomb cap return None — the
  * row-property "undecodable" contract of every codec in
  * [[CompressionCodec]]; a conforming stream decodes byte-exact
  * (BrotliSpec pins fixtures produced by an independent real-world
  * encoder at several quality levels, including dictionary-heavy
  * ones).
  *
  * The encoder emits a conforming subset (literals + distance-coded
  * backward references under real canonical prefix codes in one
  * compressed meta-block, or raw uncompressed meta-blocks), so decode
  * tests exercise the same entropy machinery a real stream uses;
  * BrotliSpec additionally pins fixtures produced by an independent
  * real-world encoder.
  */
private[multimodal] trait BrotliCodec extends Serializable {
  this: Vp8lCodec => // shares huffmanLengths/canonicalCodes

  // ------------------------------------------------------ bit reading

  /** LSB-first bit reader over the compressed bytes. */
  private final class BrBits(bytes: Array[Byte]) {
    private var bitPos = 0
    var bad = false
    private val nBits = bytes.length.toLong * 8
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bitPos >= nBits) { bad = true; return 0 }
        val b = (bytes(bitPos >> 3) >> (bitPos & 7)) & 1
        v |= b << i
        bitPos += 1
        i += 1
      }
      v
    }
    def bit(): Int = read(1)
    /** Peek up to 4 bits without consuming (short reads near EOF pad
      * with zeros — consumption is checked by the later read).
      */
    def peek4(): Int = {
      var v = 0
      var i = 0
      while (i < 4 && bitPos + i < nBits) {
        val p = bitPos + i
        v |= ((bytes(p >> 3) >> (p & 7)) & 1) << i
        i += 1
      }
      v
    }
    def alignByte(): Unit = bitPos = (bitPos + 7) & ~7
    def readByte(): Int = {
      if ((bitPos & 7) != 0 || bitPos + 8 > nBits) { bad = true; 0 }
      else { val v = bytes(bitPos >> 3) & 0xff; bitPos += 8; v }
    }
  }

  // --------------------------------------------------- canonical codes

  /** Canonical prefix code, decoded bit-by-bit with the first-read bit
    * as the code's MSB (brotli packs code bits reversed, the deflate
    * convention). Single-symbol codes consume zero bits.
    */
  private final class BrPrefix(lengths: Array[Int]) {
    private val maxLen = 15
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach { l => if (l > 0) count(l) += 1 }
    val totalSyms: Int = count.sum
    private val single: Int =
      if (totalSyms == 1) lengths.indexWhere(_ > 0) else -1
    private val firstCode = new Array[Int](maxLen + 2)
    private val offset = new Array[Int](maxLen + 2)
    private val syms = new Array[Int](math.max(totalSyms, 1))
    val valid: Boolean = {
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
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val len = lengths(s)
        if (len > 0) { syms(next(len)) = s; next(len) += 1 }
        s += 1
      }
      ok && (totalSyms <= 1 || {
        var kraft = 0L
        var i = 1
        while (i <= maxLen) { kraft += count(i).toLong << (maxLen - i); i += 1 }
        kraft == (1L << maxLen)
      })
    }
    def readSym(br: BrBits): Int = {
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

  /** Transmission order of the complex form's code-length lengths. */
  private val BrClOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // The fixed prefix code over code-length-code lengths 0..5: a 4-bit
  // LSB-first lookup (peek 4, consume len). RFC 7932 §3.5.
  private val ClClLen =
    Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClClVal =
    Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)

  private def ceilLog2(n: Int): Int = {
    var b = 0
    while ((1 << b) < n) b += 1
    b
  }

  /** Read one prefix code over `alphabet` symbols (simple or complex
    * form). Returns null on malformation.
    */
  private def readBrPrefix(br: BrBits, alphabet: Int): BrPrefix = {
    val hskip = br.read(2)
    if (br.bad) return null
    if (hskip == 1) {
      // ---- simple: 1-4 explicitly listed symbols
      val nsym = br.read(2) + 1
      val albits = ceilLog2(alphabet)
      val s = new Array[Int](nsym)
      var i = 0
      while (i < nsym) {
        s(i) = br.read(albits)
        if (br.bad || s(i) >= alphabet) return null
        i += 1
      }
      // duplicates are invalid
      if (s.distinct.length != nsym) return null
      val lengths = new Array[Int](alphabet)
      nsym match {
        case 1 => lengths(s(0)) = 1 // degenerate: zero bits on read
        case 2 =>
          val Array(a, b) = s.sorted
          lengths(a) = 1; lengths(b) = 1
        case 3 =>
          val lo = math.min(s(1), s(2)); val hi = math.max(s(1), s(2))
          lengths(s(0)) = 1; lengths(lo) = 2; lengths(hi) = 2
        case _ =>
          if (br.bit() == 0) { // tree-select 0: [2,2,2,2]
            s.sorted.foreach(lengths(_) = 2)
          } else {             // tree-select 1: [1,2,3,3]
            val lo = math.min(s(2), s(3)); val hi = math.max(s(2), s(3))
            lengths(s(0)) = 1; lengths(s(1)) = 2
            lengths(lo) = 3; lengths(hi) = 3
          }
      }
      if (br.bad) return null
      val pc = new BrPrefix(lengths)
      if (!pc.valid) null else pc
    } else {
      // ---- complex: code-length code, then lengths with repeats
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip // hskip 0, 2 or 3 leading entries are implicit 0
      while (i < BrClOrder.length && space > 0) {
        val idx = br.peek4()
        val v = ClClVal(idx)
        br.read(ClClLen(idx))
        if (br.bad) return null
        clLens(BrClOrder(i)) = v
        if (v != 0) { space -= 32 >> v; numCodes += 1 }
        i += 1
      }
      if (space < 0) return null
      if (numCodes != 1 && space != 0) return null
      val clCode = new BrPrefix(clLens)
      if (!clCode.valid || clCode.totalSyms == 0) return null
      val lengths = new Array[Int](alphabet)
      var mainSpace = 32768
      var prevNonzero = 8
      var repeat = 0
      var repeatLen = 0
      var sym = 0
      var nonzero = 0
      while (sym < alphabet && mainSpace > 0) {
        val cl = clCode.readSym(br)
        if (cl < 0 || br.bad) return null
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          repeat = 0
          if (cl != 0) {
            prevNonzero = cl
            mainSpace -= 32768 >> cl
            nonzero += 1
          }
        } else {
          // brotli's COMPOUNDING repeats: consecutive same-kind repeat
          // symbols extend the previous run, not restart it
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevNonzero else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) { repeat -= 2; repeat <<= extraBits }
          repeat += br.read(extraBits) + 3
          if (br.bad) return null
          val n = repeat - oldRepeat
          if (sym + n > alphabet) return null
          var k = 0
          while (k < n) { lengths(sym) = newLen; sym += 1; k += 1 }
          if (newLen != 0) {
            mainSpace -= n * (32768 >> newLen)
            nonzero += n
          }
        }
      }
      if (mainSpace < 0) return null
      if (nonzero != 1 && mainSpace != 0) return null
      val pc = new BrPrefix(lengths)
      if (!pc.valid) null else pc
    }
  }

  // ----------------------------------------------------- fixed tables

  // insert-length codes: (extra bits, base)
  private val InsExtra =
    Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
      10, 12, 14, 24)
  private val InsBase =
    Array(0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130,
      194, 322, 578, 1090, 2114, 6210, 22594)
  // copy-length codes
  private val CopyExtra =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7,
      8, 9, 10, 24)
  private val CopyBase =
    Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70,
      102, 134, 198, 326, 582, 1094, 2118)
  // block-count codes (26 symbols)
  private val BlkExtra =
    Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8,
      9, 10, 11, 12, 13, 24)
  private val BlkBase: Array[Int] = {
    val b = new Array[Int](26)
    var acc = 1
    var i = 0
    while (i < 26) { b(i) = acc; acc += 1 << BlkExtra(i); i += 1 }
    b
  }
  // insert&copy cells: (insert offset, copy offset, implicit dist 0)
  private val CmdCells: Array[(Int, Int, Boolean)] = Array(
    (0, 0, true), (0, 8, true), (0, 0, false), (0, 8, false),
    (8, 0, false), (8, 8, false), (0, 16, false), (16, 0, false),
    (8, 16, false), (16, 8, false), (16, 16, false))

  // Literal context lookup tables for the UTF8 and Signed modes —
  // extracted VERBATIM from a reference implementation via the
  // self-reporting context-probe streams in BrotliSpec (identity
  // context map over 65 single-symbol trees: each decoded literal IS
  // the context id), so every entry is ground truth, not transcription.
  private val CtxLut0: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 4, 4, 0, 0, 4, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    8, 12, 16, 12, 12, 20, 12, 16, 24, 28, 12, 12, 32, 12, 36, 12,
    44, 44, 44, 44, 44, 44, 44, 44, 44, 44, 32, 32, 24, 40, 28, 12,
    12, 48, 52, 52, 52, 48, 52, 52, 52, 48, 52, 52, 52, 52, 52, 48,
    52, 52, 52, 52, 52, 48, 52, 52, 52, 52, 52, 24, 12, 28, 12, 12,
    12, 56, 60, 60, 60, 56, 60, 60, 60, 56, 60, 60, 60, 60, 60, 56,
    60, 60, 60, 60, 60, 56, 60, 60, 60, 60, 60, 24, 12, 28, 12, 0,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3,
    2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3, 2, 3)
  private val CtxLut1: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1,
    1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1,
    1, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 1, 1, 1, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2)
  private val CtxLut2: Array[Int] = Array(
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // ------------------------------------------------ static dictionary

  /** RFC 7932 Appendix A: word-count bits per copy length 4..24. */
  private val DictNdBits =
    Array(10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7,
      6, 6, 5, 5)
  private val DictOffsets: Array[Int] = {
    val o = new Array[Int](22)
    var acc = 0
    var i = 0
    while (i < 21) { o(i) = acc; acc += (i + 4) << DictNdBits(i); i += 1 }
    o(21) = acc // == 122784
    o
  }

  /** The 122,784-byte static dictionary (RFC 7932 Appendix A),
    * recovered byte-for-byte from the published format (sha-256
    * 20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70)
    * and shipped as a classpath resource.
    */
  private lazy val Dict: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli-dict.bin")
    require(in != null, "graft/brotli-dict.bin resource missing")
    try {
      val out = new java.io.ByteArrayOutputStream(122784)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      val d = out.toByteArray
      require(d.length == 122784, s"brotli dict ${d.length} bytes")
      d
    } finally in.close()
  }

  /** The 121 word transforms: (prefix, kind, suffix) with kind 0 =
    * identity, 1-9 = omit-first-N, 17-25 = omit-last-N, 32 =
    * ferment-first (uppercase), 33 = ferment-all. RFC 7932 §8,
    * prefix/suffix bytes stored latin1.
    */
  private val DictTransforms: Array[(String, Int, String)] = Array(
    ("", 0, ""),
    ("", 0, " "),
    (" ", 0, " "),
    ("", 1, ""),
    ("", 32, " "),
    ("", 0, " the "),
    (" ", 0, ""),
    ("s ", 0, " "),
    ("", 0, " of "),
    ("", 32, ""),
    ("", 0, " and "),
    ("", 2, ""),
    ("", 17, ""),
    (", ", 0, " "),
    ("", 0, ", "),
    (" ", 32, " "),
    ("", 0, " in "),
    ("", 0, " to "),
    ("e ", 0, " "),
    ("", 0, "\""),
    ("", 0, "."),
    ("", 0, "\">"),
    ("", 0, "\n"),
    ("", 19, ""),
    ("", 0, "]"),
    ("", 0, " for "),
    ("", 3, ""),
    ("", 18, ""),
    ("", 0, " a "),
    ("", 0, " that "),
    (" ", 32, ""),
    ("", 0, ". "),
    (".", 0, ""),
    (" ", 0, ", "),
    ("", 4, ""),
    ("", 0, " with "),
    ("", 0, "'"),
    ("", 0, " from "),
    ("", 0, " by "),
    ("", 5, ""),
    ("", 6, ""),
    (" the ", 0, ""),
    ("", 20, ""),
    ("", 0, ". The "),
    ("", 33, ""),
    ("", 0, " on "),
    ("", 0, " as "),
    ("", 0, " is "),
    ("", 23, ""),
    ("", 17, "ing "),
    ("", 0, "\n\t"),
    ("", 0, ":"),
    (" ", 0, ". "),
    ("", 0, "ed "),
    ("", 9, ""),
    ("", 7, ""),
    ("", 22, ""),
    ("", 0, "("),
    ("", 32, ", "),
    ("", 24, ""),
    ("", 0, " at "),
    ("", 0, "ly "),
    (" the ", 0, " of "),
    ("", 21, ""),
    ("", 25, ""),
    (" ", 32, ", "),
    ("", 32, "\""),
    (".", 0, "("),
    ("", 33, " "),
    ("", 32, "\">"),
    ("", 0, "=\""),
    (" ", 0, "."),
    (".com/", 0, ""),
    (" the ", 0, " of the "),
    ("", 32, "'"),
    ("", 0, ". This "),
    ("", 0, ","),
    (".", 0, " "),
    ("", 32, "("),
    ("", 32, "."),
    ("", 0, " not "),
    (" ", 0, "=\""),
    ("", 0, "er "),
    (" ", 33, " "),
    ("", 0, "al "),
    (" ", 33, ""),
    ("", 0, "='"),
    ("", 33, "\""),
    ("", 32, ". "),
    (" ", 0, "("),
    ("", 0, "ful "),
    (" ", 32, ". "),
    ("", 0, "ive "),
    ("", 0, "less "),
    ("", 33, "'"),
    ("", 0, "est "),
    (" ", 32, "."),
    ("", 33, "\">"),
    (" ", 0, "='"),
    ("", 32, ","),
    ("", 0, "ize "),
    ("", 33, "."),
    ("\u00c2\u00a0", 0, ""),
    (" ", 0, ","),
    ("", 32, "=\""),
    ("", 33, "=\""),
    ("", 0, "ous "),
    ("", 33, ", "),
    ("", 32, "='"),
    (" ", 32, ","),
    (" ", 33, "=\""),
    (" ", 33, ", "),
    ("", 33, ","),
    ("", 33, "("),
    ("", 33, ". "),
    (" ", 33, "."),
    ("", 33, "='"),
    (" ", 33, ". "),
    (" ", 32, "=\""),
    (" ", 33, "='"),
    (" ", 32, "='"))

  /** RFC 7932 §8 "ferment" (uppercase) step at `pos`; returns the
    * number of bytes consumed.
    */
  private def ferment(b: Array[Byte], pos: Int): Int = {
    val c = b(pos) & 0xff
    if (c < 192) {
      if (c >= 97 && c <= 122) b(pos) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (pos + 1 < b.length) b(pos + 1) = (b(pos + 1) ^ 32).toByte
      2
    } else {
      if (pos + 2 < b.length) b(pos + 2) = (b(pos + 2) ^ 5).toByte
      3
    }
  }

  /** Transformed dictionary word for a reference of copy length
    * `clen` at `address`; None when out of range.
    */
  private def dictWord(clen: Int, address: Int): Option[Array[Byte]] = {
    if (clen < 4 || clen > 24) return None
    val ndbits = DictNdBits(clen - 4)
    val index = address & ((1 << ndbits) - 1)
    val tid = address >>> ndbits
    if (tid > 120) return None
    val base = DictOffsets(clen - 4) + index * clen
    val (prefix, kind, suffix) = DictTransforms(tid)
    val core: Array[Byte] =
      if (kind == 0) java.util.Arrays.copyOfRange(Dict, base, base + clen)
      else if (kind >= 1 && kind <= 9) { // omit first N
        val n = math.min(kind, clen)
        java.util.Arrays.copyOfRange(Dict, base + n, base + clen)
      } else if (kind >= 17 && kind <= 25) { // omit last N
        val n = math.min(kind - 16, clen)
        java.util.Arrays.copyOfRange(Dict, base, base + clen - n)
      } else { // ferment
        val w = java.util.Arrays.copyOfRange(Dict, base, base + clen)
        if (kind == 32) ferment(w, 0)
        else { var i = 0; while (i < w.length) i += ferment(w, i) }
        w
      }
    val p = prefix.getBytes("ISO-8859-1")
    val s = suffix.getBytes("ISO-8859-1")
    val out = new Array[Byte](p.length + core.length + s.length)
    System.arraycopy(p, 0, out, 0, p.length)
    System.arraycopy(core, 0, out, p.length, core.length)
    System.arraycopy(s, 0, out, p.length + core.length, s.length)
    Some(out)
  }

  private def literalContext(mode: Int, p1: Int, p2: Int): Int =
    mode match {
      case 0 => p1 & 0x3f                          // LSB6
      case 1 => p1 >> 2                            // MSB6
      case 2 => CtxLut0(p1) | CtxLut1(p2)          // UTF8
      case _ => (CtxLut2(p1) << 3) | CtxLut2(p2)   // Signed
    }

  // ---------------------------------------------------------- decoder

  /** Decompress a brotli stream; None on malformation, truncation, the
    * bomb cap, or a static-dictionary reference (the documented subset
    * boundary — never a wrong byte). Headerless format: callers route
    * by DECLARED encoding (`Content-Encoding: br`), not magic sniff.
    */
  def unbrotli(bytes: Array[Byte],
               maxBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (bytes.isEmpty) return None
    val br = new BrBits(bytes)
    // window size
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.read(3)
        if (n != 0) 17 + n
        else {
          val m = br.read(3)
          if (m == 1) return None
          else if (m == 0) 17
          else 8 + m
        }
      }
    if (br.bad) return None
    val maxBackward = (1L << wbits) - 16
    var out = new Array[Byte](math.min(1 << 16, maxBytes))
    var outLen = 0
    // takes the CURRENT length explicitly — decodeCompressedBlock
    // advances a local cursor and syncs outLen only at block end
    def ensure(cur: Int, n: Int): Boolean = {
      if (cur + n > maxBytes) return false
      if (cur + n > out.length) {
        var cap = out.length
        while (cap < cur + n) cap = math.min(cap * 2, maxBytes)
        out = java.util.Arrays.copyOf(out, cap)
      }
      true
    }
    // cross-meta-block state
    val distRb = Array(16, 15, 11, 4)
    var distIdx = 0
    var p1 = 0
    var p2 = 0
    var isLast = false
    while (!isLast) {
      isLast = br.bit() == 1
      if (br.bad) return None
      if (isLast && br.bit() == 1) {
        if (br.bad) return None
        return Some(java.util.Arrays.copyOf(out, outLen)) // empty last
      }
      val mnibCode = br.read(2)
      if (br.bad) return None
      if (mnibCode == 3) {
        // metadata block: skip
        if (isLast) return None
        if (br.bit() == 1) return None // reserved
        val skipBytes = br.read(2)
        var skipLen = 0
        if (skipBytes > 0) {
          var i = 0
          var v = 0
          while (i < skipBytes) { v |= br.read(8) << (8 * i); i += 1 }
          if (skipBytes > 1 && (v >> (8 * (skipBytes - 1))) == 0)
            return None
          skipLen = v + 1
        }
        br.alignByte()
        var i = 0
        while (i < skipLen) { br.readByte(); i += 1 }
        if (br.bad) return None
      } else {
        val mnib = 4 + mnibCode
        val mlen = br.read(4 * mnib) + 1
        if (br.bad) return None
        if (mnib > 4 && (mlen - 1) >> (4 * (mnib - 1)) == 0) return None
        val uncompressed = !isLast && br.bit() == 1
        if (br.bad) return None
        if (uncompressed) {
          br.alignByte()
          if (!ensure(outLen, mlen)) return None
          var i = 0
          while (i < mlen) {
            out(outLen) = br.readByte().toByte
            outLen += 1; i += 1
          }
          if (br.bad) return None
          p1 = out(outLen - 1) & 0xff
          p2 = if (outLen >= 2) out(outLen - 2) & 0xff else 0
        } else {
          if (!decodeCompressedBlock(br, mlen, out, outLen, ensure _,
              () => out, distRb, () => distIdx, i => distIdx = i,
              maxBackward, () => p1, () => p2,
              (a, b) => { p1 = a; p2 = b },
              n => outLen = n))
            return None
        }
      }
    }
    Some(java.util.Arrays.copyOf(out, outLen))
  }

  // The compressed-meta-block decoder. Mutable state is threaded
  // through accessors because `out` can be re-allocated by ensure().
  private def decodeCompressedBlock(
      br: BrBits, mlen: Int, out0: Array[Byte], outLen0: Int,
      ensure: (Int, Int) => Boolean, outRef: () => Array[Byte],
      distRb: Array[Int], getDistIdx: () => Int, setDistIdx: Int => Unit,
      maxBackward: Long, getP1: () => Int, getP2: () => Int,
      setP: (Int, Int) => Unit, setOutLen: Int => Unit): Boolean = {
    var outLen = outLen0
    var p1 = getP1()
    var p2 = getP2()
    var distIdx = getDistIdx()

    def readVarNb(): Int = { // NBLTYPES / NTREES in 1..256
      if (br.bit() == 0) 1
      else {
        val k = br.read(3)
        if (k == 0) 2 else (1 << k) + 1 + br.read(k)
      }
    }

    // per-category block machinery
    val nbl = new Array[Int](3)
    val btype = new Array[Int](3)
    val btypePrev = new Array[Int](3)
    val blen = new Array[Int](3)
    val btCode = new Array[BrPrefix](3)
    val blCode = new Array[BrPrefix](3)
    def readBlockLen(pc: BrPrefix): Int = {
      val s = pc.readSym(br)
      if (s < 0 || s >= 26) { br.bad = true; 0 }
      else BlkBase(s) + br.read(BlkExtra(s))
    }
    var cat = 0
    while (cat < 3) {
      nbl(cat) = readVarNb()
      if (br.bad || nbl(cat) > 256) return false
      btype(cat) = 0; btypePrev(cat) = 1
      if (nbl(cat) >= 2) {
        btCode(cat) = readBrPrefix(br, nbl(cat) + 2)
        if (btCode(cat) == null) return false
        blCode(cat) = readBrPrefix(br, 26)
        if (blCode(cat) == null) return false
        blen(cat) = readBlockLen(blCode(cat))
        if (br.bad) return false
      } else blen(cat) = Int.MaxValue
      cat += 1
    }
    def blockSwitch(c: Int): Boolean = {
      val s = btCode(c).readSym(br)
      if (s < 0 || br.bad) return false
      val t =
        if (s == 0) btypePrev(c)
        else if (s == 1) (btype(c) + 1) % nbl(c)
        else s - 2
      if (t >= nbl(c)) return false
      btypePrev(c) = btype(c); btype(c) = t
      blen(c) = readBlockLen(blCode(c))
      !br.bad
    }

    val npostfix = br.read(2)
    val ndirect = br.read(4) << npostfix
    if (br.bad) return false
    val postfixMask = (1 << npostfix) - 1
    // context modes, one per literal block type
    val ctxModes = new Array[Int](nbl(0))
    var i = 0
    while (i < nbl(0)) { ctxModes(i) = br.read(2); i += 1 }
    if (br.bad) return false
    // context maps
    def readContextMap(nTrees: Int, size: Int): Array[Int] = {
      val map = new Array[Int](size)
      if (nTrees >= 2) {
        val rleMax = if (br.bit() == 1) br.read(4) + 1 else 0
        val pc = readBrPrefix(br, nTrees + rleMax)
        if (pc == null) return null
        var i = 0
        while (i < size) {
          val s = pc.readSym(br)
          if (s < 0 || br.bad) return null
          if (s == 0) { map(i) = 0; i += 1 }
          else if (s <= rleMax) {
            var reps = (1 << s) + br.read(s)
            if (br.bad || i + reps > size) return null
            while (reps > 0) { map(i) = 0; i += 1; reps -= 1 }
          } else { map(i) = s - rleMax; i += 1 }
        }
        if (br.bit() == 1) { // inverse move-to-front
          val mtf = Array.tabulate(256)(identity)
          var j = 0
          while (j < size) {
            val idx = map(j)
            val v = mtf(idx)
            var k = idx
            while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
            mtf(0) = v
            map(j) = v
            j += 1
          }
        }
        if (br.bad) null else map
      } else map // all zeros
    }
    val nTreesL = readVarNb()
    if (br.bad || nTreesL > 256) return false
    val litMap = readContextMap(nTreesL, 64 * nbl(0))
    if (litMap == null) return false
    val nTreesD = readVarNb()
    if (br.bad || nTreesD > 256) return false
    val distMap = readContextMap(nTreesD, 4 * nbl(2))
    if (distMap == null) return false
    // prefix code arrays
    val litCodes = new Array[BrPrefix](nTreesL)
    i = 0
    while (i < nTreesL) {
      litCodes(i) = readBrPrefix(br, 256)
      if (litCodes(i) == null) return false
      i += 1
    }
    val icCodes = new Array[BrPrefix](nbl(1))
    i = 0
    while (i < nbl(1)) {
      icCodes(i) = readBrPrefix(br, 704)
      if (icCodes(i) == null) return false
      i += 1
    }
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val distCodes = new Array[BrPrefix](nTreesD)
    i = 0
    while (i < nTreesD) {
      distCodes(i) = readBrPrefix(br, distAlphabet)
      if (distCodes(i) == null) return false
      i += 1
    }

    // ------------------------------------------------- command loop
    var produced = 0
    while (produced < mlen) {
      if (blen(1) == 0 && !blockSwitch(1)) return false
      blen(1) -= 1
      val cmd = icCodes(btype(1)).readSym(br)
      if (cmd < 0 || br.bad) return false
      val (insOff, copyOff, implicitD) = CmdCells(cmd >> 6)
      val insCode = insOff + ((cmd >> 3) & 7)
      val copyCode = copyOff + (cmd & 7)
      val ilen = InsBase(insCode) + br.read(InsExtra(insCode))
      val clen = CopyBase(copyCode) + br.read(CopyExtra(copyCode))
      if (br.bad || produced + ilen > mlen) return false
      // literals
      if (!ensure(outLen, ilen)) return false
      var out = outRef()
      var j = 0
      while (j < ilen) {
        if (blen(0) == 0 && !blockSwitch(0)) return false
        blen(0) -= 1
        val ctx = literalContext(ctxModes(btype(0)), p1, p2)
        val tree = litMap(btype(0) * 64 + ctx)
        val lit = litCodes(tree).readSym(br)
        if (lit < 0 || br.bad) return false
        out(outLen) = lit.toByte
        outLen += 1
        p2 = p1; p1 = lit
        j += 1
      }
      produced += ilen
      if (produced == mlen) {
        // command ends at the meta-block boundary: no copy part
        setOutLen(outLen); setP(p1, p2); setDistIdx(distIdx)
        return true
      }
      // distance
      var distance = 0
      var push = false
      if (implicitD) {
        distance = distRb((distIdx + 3) & 3)
      } else {
        if (blen(2) == 0 && !blockSwitch(2)) return false
        blen(2) -= 1
        val ctx = if (clen > 4) 3 else clen - 2
        val tree = distMap(btype(2) * 4 + ctx)
        val dcode = distCodes(tree).readSym(br)
        if (dcode < 0 || br.bad) return false
        if (dcode < 16) {
          if (dcode < 4) distance = distRb((distIdx + 3 - dcode) & 3)
          else {
            val base =
              if (dcode < 10) distRb((distIdx + 3) & 3)
              else distRb((distIdx + 2) & 3)
            val k = (dcode - 4) % 6
            val delta = Array(-1, 1, -2, 2, -3, 3)(k)
            distance = base + delta
          }
          if (distance <= 0) return false
          push = dcode != 0
        } else if (dcode < 16 + ndirect) {
          distance = dcode - 16 + 1
          push = true
        } else {
          val x = dcode - ndirect - 16
          val hcode = x >> npostfix
          val lcode = x & postfixMask
          val ndistbits = 1 + (hcode >> 1)
          val extra = br.read(ndistbits)
          if (br.bad) return false
          val offset = ((2 + (hcode & 1)) << ndistbits) - 4
          distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
          push = true
        }
      }
      val maxDist = math.min(maxBackward, outLen.toLong)
      if (distance > maxDist) {
        // static-dictionary reference: the TRANSFORMED word's length
        // (not clen) counts toward MLEN; the ring is NOT updated
        val word = dictWord(clen, (distance - maxDist - 1).toInt)
          .getOrElse { return false }
        if (produced + word.length > mlen) return false
        if (!ensure(outLen, word.length)) return false
        out = outRef()
        System.arraycopy(word, 0, out, outLen, word.length)
        outLen += word.length
        produced += word.length
        if (outLen >= 1) p1 = out(outLen - 1) & 0xff
        if (outLen >= 2) p2 = out(outLen - 2) & 0xff
      } else {
        if (push) {
          distRb(distIdx & 3) = distance
          distIdx += 1
        }
        if (produced + clen > mlen) return false
        if (!ensure(outLen, clen)) return false
        out = outRef()
        var k = 0
        while (k < clen) {
          out(outLen) = out(outLen - distance)
          outLen += 1
          k += 1
        }
        produced += clen
        p1 = out(outLen - 1) & 0xff
        p2 = out(outLen - 2) & 0xff
      }
    }
    setOutLen(outLen); setP(p1, p2); setDistIdx(distIdx)
    true
  }

  // ---------------------------------------------------------- encoder

  private final class BrWriter {
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
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write((code >> i) & 1, 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (nbits > 0) { bos.write((acc & 0xff).toInt); acc = 0; nbits = 0 }
      bos.toByteArray
    }
  }

  /** Emit one prefix code's description over `alphabet` symbols from
    * its canonical `lengths`: simple form for ≤4 used symbols, else
    * the complex code-length-coded form (17-repeats open long zero
    * gaps; the degenerate single-CL-symbol code costs zero bits per
    * length, mirroring the decoder's single path).
    */
  private def writeBrPrefix(bw: BrWriter, lengths: Array[Int],
                            alphabet: Int): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size <= 4 &&
      (used.size < 3 || used.forall(s => lengths(s) <= 2)) &&
      (used.size != 4 || used.forall(s => lengths(s) == 2)) &&
      (used.size != 3 ||
        used.count(lengths(_) == 1) == 1) &&
      (used.size != 2 || used.forall(lengths(_) == 1)) &&
      used.size >= 1) {
      bw.write(1, 2)               // HSKIP = 1: simple
      bw.write(used.size - 1, 2)
      val albits = ceilLog2(alphabet)
      used.size match {
        case 1 => bw.write(used.head, albits)
        case 2 => used.foreach(bw.write(_, albits))
        case 3 =>
          // the first listed symbol carries length 1
          val first = used.find(lengths(_) == 1).get
          bw.write(first, albits)
          used.filter(_ != first).foreach(bw.write(_, albits))
        case _ =>
          used.foreach(bw.write(_, albits))
          bw.write(0, 1)           // tree-select 0: [2,2,2,2]
      }
    } else {
      // complex form. Build the emission plan: literal lengths with
      // one 17-repeat opening each zero gap of >= 3.
      val last = used.last
      val plan = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var s = 0
      while (s <= last) {
        if (lengths(s) == 0) {
          var z = 0
          while (s + z <= last && lengths(s + z) == 0) z += 1
          var rem = z
          if (rem >= 3) {
            val rep = math.min(rem, 10)
            plan += ((17, rep - 3, 3)) // symbol, extra value, extra bits
            rem -= rep
          }
          while (rem > 0) { plan += ((0, 0, 0)); rem -= 1 }
          s += z
        } else {
          plan += ((lengths(s), 0, 0))
          s += 1
        }
      }
      val clHist = new Array[Long](18)
      plan.foreach { case (sym, _, _) => clHist(sym) += 1 }
      val clLens = huffmanLengths(clHist, maxLen = 5)
      val clCodes = canonicalCodes(clLens)
      bw.write(0, 2)               // HSKIP = 0: complex
      // cl-of-cl entries in BrClOrder, stopping when the space fills
      var space = 32
      var i = 0
      while (i < BrClOrder.length && space > 0) {
        val v = clLens(BrClOrder(i))
        v match {
          case 0 => bw.write(0, 2)
          case 1 => bw.write(7, 4)
          case 2 => bw.write(3, 3)
          case 3 => bw.write(2, 2)
          case 4 => bw.write(1, 2)
          case _ => bw.write(15, 4)
        }
        if (v != 0) space -= 32 >> v
        i += 1
      }
      // lengths under the cl code — zero bits each if it degenerated
      val clSingle = clLens.count(_ > 0) == 1
      plan.foreach { case (sym, extraV, extraB) =>
        if (!clSingle) bw.writeCode(clCodes(sym), clLens(sym))
        if (extraB > 0) bw.write(extraV, extraB)
      }
    }
  }

  private def insCodeOf(n: Int): Int = {
    var c = 23
    var i = 0
    while (i < 24) { if (n < InsBase(i)) { c = i - 1; i = 24 } else i += 1 }
    c
  }
  private def copyCodeOf(n: Int): Int = {
    var c = 23
    var i = 0
    while (i < 24) { if (n < CopyBase(i)) { c = i - 1; i = 24 } else i += 1 }
    c
  }
  private def cmdSymbol(insCode: Int, copyCode: Int): Int = {
    // explicit-distance cells only (2..10)
    var cell = 2
    while (cell <= 10) {
      val (io, co, _) = CmdCells(cell)
      if (insCode >= io && insCode < io + 8 &&
        copyCode >= co && copyCode < co + 8)
        return cell * 64 + ((insCode - io) << 3) + (copyCode - co)
      cell += 1
    }
    -1
  }
  /** (dcode, extraBits, extraVal) for a distance under NPOSTFIX=0,
    * NDIRECT=0 — long codes only (the encoder never leans on the ring
    * buffer, so its streams exercise the decoder's formula path).
    */
  private def distSymbol(d: Int): (Int, Int, Int) = {
    var hcode = 0
    while (true) {
      val nb = 1 + (hcode >> 1)
      val off = ((2 + (hcode & 1)) << nb) - 4
      if (d >= off + 1 && d <= off + (1 << nb))
        return (16 + hcode, nb, d - 1 - off)
      hcode += 1
    }
    throw new IllegalStateException
  }

  /** Genuine minimal brotli encoder: one compressed meta-block of
    * literals and real backward references (distance-1 runs plus
    * 4-gram hash matches) under canonical prefix codes — or raw
    * uncompressed meta-blocks with `compress = false`. Window 16,
    * NPOSTFIX/NDIRECT 0, single block type per category, context mode
    * LSB6 with a single literal tree (context-independent by
    * construction). Fixture writer for [[unbrotli]]; independently
    * decodable by any conforming implementation.
    */
  def brotliBytes(data: Array[Byte],
                  compress: Boolean = true): Array[Byte] = {
    val bw = new BrWriter()
    bw.write(0, 1) // WBITS = 16
    if (data.isEmpty) {
      bw.write(1, 1) // ISLAST
      bw.write(1, 1) // ISLASTEMPTY
      return bw.bytes()
    }
    if (!compress) {
      // uncompressed meta-blocks (≤ 2^16 each), empty last block
      var off = 0
      while (off < data.length) {
        val n = math.min(1 << 16, data.length - off)
        bw.write(0, 1)         // not last
        bw.write(0, 2)         // MNIBBLES = 4
        bw.write(n - 1, 16)
        bw.write(1, 1)         // ISUNCOMPRESSED
        bw.bytes()             // flush pads to the byte boundary
        (0 until n).foreach(i => bw.write(data(off + i) & 0xff, 8))
        off += n
      }
      bw.write(1, 1); bw.write(1, 1) // empty last
      return bw.bytes()
    }
    require(data.length <= (1 << 24), "single-meta-block encoder")
    val mlen = data.length
    bw.write(1, 1) // ISLAST
    bw.write(0, 1) // not empty
    val mnib = if (mlen <= (1 << 16)) 4 else if (mlen <= (1 << 20)) 5 else 6
    bw.write(mnib - 4, 2)
    bw.write(mlen - 1, 4 * mnib)
    bw.write(0, 1); bw.write(0, 1); bw.write(0, 1) // NBLTYPES L/I/D = 1
    bw.write(0, 2) // NPOSTFIX
    bw.write(0, 4) // NDIRECT
    bw.write(0, 2) // context mode LSB6 for the single literal type
    bw.write(0, 1) // NTREESL = 1
    bw.write(0, 1) // NTREESD = 1
    // ---- tokenize: commands of (insert literals, copy len, distance)
    val cmds = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Int)] // litStart, ilen, clen, dist
    val gram = new java.util.HashMap[Int, Integer]()
    def gramAt(i: Int): Int =
      ((data(i) & 0xff) << 24) | ((data(i + 1) & 0xff) << 16) |
        ((data(i + 2) & 0xff) << 8) | (data(i + 3) & 0xff)
    var i = 0
    var litStart = 0
    val maxDist = (1 << 16) - 16
    while (i < mlen) {
      var bestLen = 0
      var bestDist = 0
      // distance-1 run
      if (i >= 1) {
        var l = 0
        while (i + l < mlen && data(i + l) == data(i - 1 + l) &&
          l < 16000) l += 1
        if (l >= 4) { bestLen = l; bestDist = 1 }
      }
      // 4-gram match
      if (i + 4 <= mlen) {
        val h = gram.get(gramAt(i))
        if (h != null) {
          val j = h.intValue
          val d = i - j
          if (d >= 1 && d <= maxDist) {
            var l = 0
            while (i + l < mlen && data(j + l) == data(i + l) &&
              l < 16000) l += 1
            if (l >= 6 && l > bestLen) { bestLen = l; bestDist = d }
          }
        }
        gram.put(gramAt(i), Integer.valueOf(i))
      }
      if (bestLen >= 4) {
        cmds += ((litStart, i - litStart, bestLen, bestDist))
        var k = i + 1
        val end = math.min(i + bestLen, mlen - 3)
        while (k < end) { gram.put(gramAt(k), Integer.valueOf(k)); k += 1 }
        i += bestLen
        litStart = i
      } else i += 1
    }
    if (litStart < mlen || cmds.isEmpty)
      cmds += ((litStart, mlen - litStart, 0, 0)) // trailing, no copy
    // ---- histograms
    val hLit = new Array[Long](256)
    val hCmd = new Array[Long](704)
    val hDist = new Array[Long](64)
    val enc = cmds.map { case (ls, il, cl, d) =>
      (ls until ls + il).foreach(p => hLit(data(p) & 0xff) += 1)
      val ic = insCodeOf(il)
      // a trailing no-copy command still needs a copy code; its bits
      // are never read past MLEN, use code 0 (len 2)
      val cc = if (cl > 0) copyCodeOf(cl) else 0
      val cmd = cmdSymbol(ic, cc)
      hCmd(cmd) += 1
      val ds = if (cl > 0) distSymbol(d) else null
      if (ds != null) hDist(ds._1) += 1
      (ls, il, cl, cmd, ic, cc, ds)
    }
    if (hDist.forall(_ == 0L)) hDist(16) = 1 // well-formed empty code
    val lLit = huffmanLengths(hLit)
    val lCmd = huffmanLengths(hCmd)
    val lDist = huffmanLengths(hDist)
    writeBrPrefix(bw, lLit, 256)
    writeBrPrefix(bw, lCmd, 704)
    writeBrPrefix(bw, lDist, 64)
    val cLit = canonicalCodes(lLit)
    val cCmd = canonicalCodes(lCmd)
    val cDist = canonicalCodes(lDist)
    val nLit = lLit.count(_ > 0)
    val nCmd = lCmd.count(_ > 0)
    val nDist = lDist.count(_ > 0)
    def emit(codes: Array[Int], lens: Array[Int], n: Int,
             sym: Int): Unit =
      if (n > 1) bw.writeCode(codes(sym), lens(sym))
    var produced = 0
    enc.foreach { case (ls, il, cl, cmd, ic, cc, ds) =>
      emit(cCmd, lCmd, nCmd, cmd)
      bw.write(il - InsBase(ic), InsExtra(ic))
      bw.write((if (cl > 0) cl else CopyBase(0)) - CopyBase(cc),
        CopyExtra(cc))
      (ls until ls + il).foreach(p => emit(cLit, lLit, nLit,
        data(p) & 0xff))
      produced += il
      if (produced < mlen && cl > 0) {
        emit(cDist, lDist, nDist, ds._1)
        if (ds._2 > 0) bw.write(ds._3, ds._2)
        produced += cl
      }
    }
    bw.bytes()
  }
}
