package graft.multimodal

import org.apache.spark.sql.Dataset

/** FLAC frame/subframe DECODE to PCM + a genuine minimal encoder.
  *
  * [[AudioCodec.parseFlac]] stops at STREAMINFO; this is the sample
  * layer: real lossless audio in a crawl column is FLAC-compressed,
  * and silence-trim / loudness / energy curation needs the PCM, not
  * the header. FLAC decode is exact integer arithmetic end-to-end —
  * oracle-replayable the way PNG/VP8L are. Implemented from the
  * published format (RFC 9639):
  *
  *  - frame headers: 14-bit sync, blocking strategy, the block-size /
  *    sample-rate / channel-assignment / sample-size code tables with
  *    their 8/16-bit uncommon forms, the UTF-8-style coded frame
  *    number, and CRC-8 (poly 0x07) verification;
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the
  *    binomial-coefficient predictors), LPC orders 1-32 (quantized
  *    coefficient precision + right-shift, 64-bit accumulation), each
  *    with wasted-bits unary prefixes;
  *  - residuals: 4-bit and 5-bit Rice codes in 2^po partitions
  *    (first partition shortened by the predictor order), zigzag
  *    mapping, and the raw-bits escape;
  *  - stereo decorrelation: left/side, right/side and mid/side (the
  *    side channel carries one extra bit), reconstructed exactly;
  *  - frame CRC-16 (poly 0x8005) verification.
  *
  * Truncation, bad sync, CRC mismatches, or malformed tables return
  * None — the row-property contract of every codec here. The encoder
  * emits conforming frames (constant / verbatim / fixed-order-2 Rice
  * subframes, independent or mid/side stereo) so decode tests
  * exercise the real machinery; q196's oracle replays decoded-PCM
  * statistics from the sample-generator formula, proving
  * encode→decode is the identity by arithmetic.
  */
private[multimodal] trait FlacPcmCodec extends Serializable {
  this: AudioCodec =>

  // ------------------------------------------------------ bit reader

  /** MSB-first bit reader (FLAC packs big-endian). */
  private final class FBits(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    var bad = false
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= bytes.length) { bad = true; return 0 }
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (pos >= bytes.length) { bad = true; return 0L }
        v = (v << 1) | ((bytes(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val v = readLong(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    /** Unary: zeros until a 1; returns the zero count. */
    def unary(): Int = {
      var q = 0
      while (!bad) {
        if (pos >= bytes.length) { bad = true; return 0 }
        val b = (bytes(pos) >> (7 - bit)) & 1
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        if (b == 1) return q
        q += 1
        if (q > (1 << 24)) { bad = true; return 0 }
      }
      0
    }
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def atByte: Boolean = bit == 0
  }

  private def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // ---------------------------------------------------------- decoder

  /** Full PCM decode: (rate, channels, bitsPerSample, interleaved
    * samples). None on any malformation — never a throw.
    */
  def decodeFlacPcm(bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Int])] = {
    val meta = parseFlac(0L, bytes)
    if (!meta.decode_ok) return None
    // skip metadata blocks to the first frame
    var p = 4
    var last = false
    while (!last) {
      if (p + 4 > bytes.length) return None
      last = (bytes(p) & 0x80) != 0
      val len = ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
      p += 4 + len
      if (p > bytes.length) return None
    }
    val total = meta.total_samples
    val out = new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    var done = false
    while (!done) {
      if (total > 0L && decoded >= total) done = true
      else if (p >= bytes.length) {
        // clean EOF closes an unknown-length (total = 0) stream
        if (total == 0L) done = true else return None
      } else {
        val frame = decodeFrame(bytes, p, meta)
        if (frame == null) return None
        out.add(frame._1)
        decoded += frame._1.length / meta.channels
        p = frame._2
      }
    }
    if (total > 0L && decoded != total) return None
    var n = 0
    val it = out.iterator()
    while (it.hasNext) n += it.next().length
    val all = new Array[Int](n)
    var off = 0
    val it2 = out.iterator()
    while (it2.hasNext) {
      val a = it2.next()
      System.arraycopy(a, 0, all, off, a.length)
      off += a.length
    }
    Some((meta.sample_rate, meta.channels, meta.bits_per_sample, all))
  }

  /** One frame at byte `start`; returns (interleaved samples, next
    * byte position) or null.
    */
  private def decodeFrame(bytes: Array[Byte], start: Int,
                          meta: FlacMeta): (Array[Int], Int) = {
    val br = new FBits(bytes, start)
    if (br.read(14) != 0x3ffe) return null // sync
    if (br.read(1) != 0) return null       // reserved
    br.read(1)                             // blocking strategy
    val bsCode = br.read(4)
    val srCode = br.read(4)
    val chAsgn = br.read(4)
    val ssCode = br.read(3)
    if (br.read(1) != 0 || br.bad) return null
    // UTF-8-style coded number: 1-7 bytes
    val first = br.read(8)
    if (br.bad) return null
    var extra = 0
    var mask = 0x80
    while ((first & mask) != 0 && extra < 7) { extra += 1; mask >>= 1 }
    if (extra == 1 || extra == 7) return null
    var k = 0
    while (k < math.max(0, extra - 1)) {
      if ((br.read(8) & 0xc0) != 0x80) return null
      k += 1
    }
    val blockSize = bsCode match {
      case 0 => return null
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => br.read(8) + 1
      case 7 => br.read(16) + 1
      case c => 256 << (c - 8)
    }
    srCode match {
      case 12 => br.read(8)
      case 13 | 14 => br.read(16)
      case 15 => return null
      case _ =>
    }
    if (br.bad) return null
    // the fixed fields + coded number + extras always sum to whole
    // bytes; CRC-8 covers sync..here
    if (!br.atByte) return null
    val crcPos = br.pos
    val want8 = br.read(8)
    if (br.bad || crc8(bytes, start, crcPos) != want8) return null
    val bps = ssCode match {
      case 0 => meta.bits_per_sample
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return null
    }
    val channels = if (chAsgn < 8) chAsgn + 1 else 2
    if (channels != meta.channels) return null
    if (blockSize <= 0 || blockSize > (1 << 16)) return null
    val chans = new Array[Array[Int]](channels)
    var c = 0
    while (c < channels) {
      val sideBit = chAsgn match {
        case 8 => if (c == 1) 1 else 0   // left/side
        case 9 => if (c == 0) 1 else 0   // right/side
        case 10 => if (c == 1) 1 else 0  // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(br, blockSize, bps + sideBit) match {
        case null => return null
        case a => a
      }
      c += 1
    }
    br.alignByte()
    val crc16Pos = br.pos
    val want16 = br.read(16)
    if (br.bad || crc16(bytes, start, crc16Pos) != want16) return null
    // stereo reconstruction
    chAsgn match {
      case 8 => // left/side: R = L - side
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // right/side: L = R + side
        var i = 0
        while (i < blockSize) {
          chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid2 = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ =>
    }
    val inter = new Array[Int](blockSize * channels)
    var i = 0
    while (i < blockSize) {
      var c2 = 0
      while (c2 < channels) {
        inter(i * channels + c2) = chans(c2)(i); c2 += 1
      }
      i += 1
    }
    (inter, br.pos)
  }

  private def decodeSubframe(br: FBits, n: Int, bps: Int): Array[Int] = {
    if (br.read(1) != 0) return null // zero pad bit
    val typ = br.read(6)
    var wasted = 0
    if (br.read(1) == 1) wasted = br.unary() + 1
    if (br.bad || wasted >= bps) return null
    val eb = bps - wasted
    val out = new Array[Int](n)
    if (typ == 0) { // CONSTANT
      val v = br.readSigned(eb)
      if (br.bad) return null
      java.util.Arrays.fill(out, v << wasted)
      return out
    }
    if (typ == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = br.readSigned(eb); i += 1 }
      if (br.bad) return null
      if (wasted > 0) { var i2 = 0; while (i2 < n) { out(i2) <<= wasted; i2 += 1 } }
      return out
    }
    val (order, lpc) =
      if (typ >= 8 && typ <= 12) (typ & 7, false)
      else if (typ >= 32) ((typ & 31) + 1, true)
      else return null
    if (order > n) return null
    var i = 0
    while (i < order) { out(i) = br.readSigned(eb); i += 1 }
    var coefs: Array[Int] = null
    var shift = 0
    if (lpc) {
      val precCode = br.read(4)
      if (br.bad || precCode == 15) return null
      val prec = precCode + 1
      shift = br.readSigned(5)
      if (br.bad || shift < 0) return null
      coefs = new Array[Int](order)
      var j = 0
      while (j < order) { coefs(j) = br.readSigned(prec); j += 1 }
    } else coefs = FixedCoefs(order)
    if (br.bad) return null
    // residuals
    val method = br.read(2)
    if (br.bad || method > 1) return null
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = br.read(4)
    if (br.bad) return null
    val parts = 1 << po
    if (n % parts != 0) return null
    val perPart = n / parts
    var idx = order
    var part = 0
    while (part < parts) {
      val count = if (part == 0) perPart - order else perPart
      if (count < 0) return null
      val param = br.read(paramBits)
      if (br.bad) return null
      if (param == escape) {
        val rawBits = br.read(5)
        if (br.bad) return null
        var k = 0
        while (k < count) {
          out(idx) = if (rawBits == 0) 0 else br.readSigned(rawBits)
          idx += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = br.unary()
          val r = if (param > 0) br.read(param) else 0
          if (br.bad) return null
          val u = (q.toLong << param) | r
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
          idx += 1; k += 1
        }
      }
      part += 1
    }
    if (br.bad) return null
    // reconstruct predictor
    i = order
    while (i < n) {
      var acc = 0L
      var j = 0
      while (j < order) {
        acc += coefs(j).toLong * out(i - 1 - j); j += 1
      }
      out(i) += (if (lpc) (acc >> shift).toInt else acc.toInt)
      i += 1
    }
    if (wasted > 0) { var i2 = 0; while (i2 < n) { out(i2) <<= wasted; i2 += 1 } }
    out
  }

  // ---------------------------------------------------------- encoder

  private final class FWriter {
    private val bos = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nb = 0
    def wr(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        nb += 1
        if (nb == 8) { bos.write(acc); acc = 0; nb = 0 }
        i -= 1
      }
    }
    def wrLong(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        nb += 1
        if (nb == 8) { bos.write(acc); acc = 0; nb = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { wr(0, 1); i += 1 }; wr(1, 1) }
    def alignByte(): Unit = while (nb != 0) wr(0, 1)
    def bytes(): Array[Byte] = { require(nb == 0); bos.toByteArray }
  }

  /** Encode one subframe: constant when all-equal, else fixed order 2
    * with one Rice partition (param fitted to the residual magnitude),
    * falling back to VERBATIM when Rice would expand pathologically.
    */
  private def writeSubframe(w: FWriter, s: Array[Int], bps: Int,
                            forceVerbatim: Boolean): Unit = {
    val n = s.length
    if (!forceVerbatim && s.forall(_ == s(0))) {
      w.wr(0, 1); w.wr(0, 6); w.wr(0, 1) // CONSTANT, no wasted bits
      w.wrLong(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    if (forceVerbatim || n <= 2) {
      w.wr(0, 1); w.wr(1, 6); w.wr(0, 1) // VERBATIM
      s.foreach(v => w.wrLong(v.toLong & ((1L << bps) - 1), bps))
      return
    }
    // FIXED order 2
    val res = new Array[Int](n - 2)
    var i = 2
    while (i < n) { res(i - 2) = s(i) - 2 * s(i - 1) + s(i - 2); i += 1 }
    var sumAbs = 0L
    res.foreach(r => sumAbs += math.abs(r.toLong))
    val mean = if (res.isEmpty) 0L else sumAbs / math.max(1, res.length)
    var param = 0
    while ((1L << param) < mean + 1 && param < 14) param += 1
    w.wr(0, 1); w.wr(8 | 2, 6); w.wr(0, 1) // FIXED order 2
    w.wrLong(s(0).toLong & ((1L << bps) - 1), bps)
    w.wrLong(s(1).toLong & ((1L << bps) - 1), bps)
    w.wr(0, 2)  // residual method: 4-bit Rice
    w.wr(0, 4)  // partition order 0
    w.wr(param, 4)
    res.foreach { r =>
      val u = (r.toLong << 1) ^ (r.toLong >> 63) // zigzag
      w.unary((u >>> param).toInt)
      if (param > 0) w.wrLong(u & ((1L << param) - 1), param)
    }
  }

  /** Genuine minimal FLAC encoder: STREAMINFO + fixed-blocksize frames
    * of constant / fixed-order-2-Rice / verbatim subframes.
    * `stereoMode`: "independent" or "midside" (2-channel input only).
    * Any conforming decoder reads it back; [[decodeFlacPcm]]
    * round-trips bit-exactly.
    */
  def flacEncode(rate: Int, channels: Int, bps: Int,
                 samples: Array[Int], blockSize: Int = 1024,
                 stereoMode: String = "independent",
                 verbatim: Boolean = false): Array[Byte] = {
    require(channels >= 1 && channels <= 8)
    require(samples.length % channels == 0)
    require(bps >= 8 && bps <= 24)
    val nFrames = samples.length / channels
    val head = new java.io.ByteArrayOutputStream()
    head.write('f'); head.write('L'); head.write('a'); head.write('C')
    head.write(0x80); head.write(0); head.write(0); head.write(34)
    val bs = blockSize
    head.write(bs >> 8); head.write(bs & 0xff)
    head.write(bs >> 8); head.write(bs & 0xff)
    for (_ <- 0 until 6) head.write(0)
    var acc = (rate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | nFrames.toLong
    for (i <- 7 to 0 by -1) head.write(((acc >>> (8 * i)) & 0xff).toInt)
    for (_ <- 0 until 16) head.write(0) // md5 unknown
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.toByteArray)
    var frameNo = 0
    var off = 0
    while (off < nFrames) {
      val n = math.min(bs, nFrames - off)
      val w = new FWriter()
      w.wr(0x3ffe, 14); w.wr(0, 1); w.wr(0, 1) // sync, reserved, fixed
      w.wr(7, 4)          // block size: 16-bit value - 1 follows
      w.wr(0, 4)          // sample rate: from STREAMINFO
      val midside = channels == 2 && stereoMode == "midside"
      w.wr(if (midside) 10 else channels - 1, 4)
      val ssCode = bps match {
        case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5
        case 24 => 6; case _ => 0
      }
      w.wr(ssCode, 3); w.wr(0, 1)
      // UTF-8 coded frame number (fits 1-2 bytes for our fixtures)
      if (frameNo < 0x80) w.wr(frameNo, 8)
      else {
        require(frameNo < 0x800)
        w.wr(0xc0 | (frameNo >> 6), 8); w.wr(0x80 | (frameNo & 0x3f), 8)
      }
      w.wr(n - 1, 16)
      // materialize identical header bytes to compute CRC-8
      val partial = {
        val tmp = new FWriter()
        // re-emit identical header bits
        tmp.wr(0x3ffe, 14); tmp.wr(0, 1); tmp.wr(0, 1)
        tmp.wr(7, 4); tmp.wr(0, 4)
        tmp.wr(if (midside) 10 else channels - 1, 4)
        tmp.wr(ssCode, 3); tmp.wr(0, 1)
        if (frameNo < 0x80) tmp.wr(frameNo, 8)
        else {
          tmp.wr(0xc0 | (frameNo >> 6), 8)
          tmp.wr(0x80 | (frameNo & 0x3f), 8)
        }
        tmp.wr(n - 1, 16)
        tmp.bytes()
      }
      w.wr(crc8(partial, 0, partial.length), 8)
      // channels
      if (midside) {
        val mid = new Array[Int](n)
        val side = new Array[Int](n)
        var i = 0
        while (i < n) {
          val l = samples((off + i) * 2)
          val r = samples((off + i) * 2 + 1)
          mid(i) = (l + r) >> 1
          side(i) = l - r
          i += 1
        }
        writeSubframe(w, mid, bps, verbatim)
        writeSubframe(w, side, bps + 1, verbatim)
      } else {
        var c = 0
        while (c < channels) {
          val ch = new Array[Int](n)
          var i = 0
          while (i < n) { ch(i) = samples((off + i) * channels + c); i += 1 }
          writeSubframe(w, ch, bps, verbatim)
          c += 1
        }
      }
      w.alignByte()
      val body = w.bytes()
      out.write(body)
      val c16 = crc16(body, 0, body.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      off += n
      frameNo += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------- operators

  /** Per-channel exact-integer stats over DECODED FLAC PCM — the
    * [[WavCodec.wavStats]] row shape, so WAV and FLAC columns feed
    * the same curation gates. Undecodable → one sentinel row.
    */
  def flacStats(id: Long, bytes: Array[Byte]): Seq[WavStats] = {
    decodeFlacPcm(bytes) match {
      case Some((_, ch, _, pcm)) =>
        val frames = pcm.length / ch
        val peak = new Array[Int](ch)
        val sAbs = new Array[Long](ch)
        val sSq = new Array[Long](ch)
        var i = 0
        while (i < pcm.length) {
          val c = i % ch
          val s = pcm(i)
          val a = math.abs(s)
          if (a > peak(c)) peak(c) = a
          sAbs(c) += a
          sSq(c) += s.toLong * s
          i += 1
        }
        (0 until ch).map(c =>
          WavStats(id, c, frames.toLong, peak(c), sAbs(c), sSq(c),
            decode_ok = true))
      case None =>
        Seq(WavStats(id, -1, -1L, -1, -1L, -1L, decode_ok = false))
    }
  }

  /** Partition-wise FLAC PCM stats — one decoder pass per partition,
    * blobs never shuffle, one row per (blob, channel).
    */
  def decodeFlacStats(blobs: Dataset[MediaBlob]): Dataset[WavStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => flacStats(b.media_id, b.content)))
  }
}
