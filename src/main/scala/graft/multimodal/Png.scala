package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

case class PngMeta(media_id: Long, width: Int, height: Int,
                   bit_depth: Int, color_type: Int, idat_bytes: Long,
                   decode_ok: Boolean)

case class ImageHashBit(media_id: Long, algo: String, bit_no: Int,
                        bit: Boolean)

/** PNG: writer/parser, full pixel decode, resize, perceptual hashes (aHash/dHash) and banded near-dup pairs.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait PngCodec extends Serializable {

  /** Format-dispatched pixel decode — implemented by
    * [[DispatchCodec]] (magic sniff → PNG / JPEG / GIF / WebP-VP8L
    * decoder), abstract here so the perceptual-hash family below
    * covers EVERY decodable image container, not just PNG: a crawl
    * near-dup pass that only hashes one format silently under-dedups
    * the rest of the corpus.
    */
  def decodeImagePixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])]

  private val BadPng = PngMeta(0L, -1, -1, -1, -1, -1L, decode_ok = false)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Minimal real PNG writer (S4's blobs are images —
    * extract_utils.py:50-59): signature + IHDR + one zlib-deflated
    * IDAT of filter-0 RGB scanlines + IEND, all chunk CRCs genuine
    * (java.util.zip). Any PNG tool accepts the output; generated
    * without image libraries, deterministic per id.
    */
  /** Encode raw RGB triplets (row-major, 3 bytes/pixel) as a real PNG:
    * filter-0 scanlines, one zlib-deflated IDAT, genuine chunk CRCs.
    * The writer behind [[syntheticPng]] and [[resizePng]].
    */
  def pngEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
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
    // filter-0 scanlines: per-row filter byte + the row's pixel bytes
    val raw = new Array[Byte](height * (1 + width * 3))
    var p = 0
    (0 until height).foreach { r =>
      raw(p) = 0; p += 1
      System.arraycopy(rgb, r * width * 3, raw, p, width * 3)
      p += width * 3
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
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  def syntheticPng(id: Long, width: Int, height: Int): MediaBlob = {
    // deterministic id-seeded pixel pattern
    val rgb = new Array[Byte](width * height * 3)
    var x = id * 6364136223846793005L + 1442695040888963407L
    (0 until rgb.length).foreach { i =>
      x = x * 6364136223846793005L + 1442695040888963407L
      rgb(i) = (x >>> 56).toByte
    }
    MediaBlob(id, "image", pngEncode(width, height, rgb))
  }

  /** [[syntheticPng]]'s structured sibling for perceptual hashing: a
    * wrapped-gradient image, `gray(x,y) = (id·31 + x·7 + y·13) mod
    * 256` on all three channels — every block statistic is
    * closed-form integer arithmetic an oracle can replay, while the
    * bytes still travel the full encode→decode path. `tweakOrigin`
    * bumps pixel (0,0) by one gray level (mod 256): the near-dup
    * plant whose perceptual hash must land within a couple of bits
    * of the original.
    */
  def syntheticPngGradient(id: Long, width: Int, height: Int,
                           tweakOrigin: Boolean = false): MediaBlob = {
    val rgb = new Array[Byte](width * height * 3)
    (0 until height).foreach { y =>
      (0 until width).foreach { x =>
        val g0 = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = if (tweakOrigin && x == 0 && y == 0) (g0 + 1) % 256
                else g0
        val p = (y * width + x) * 3
        rgb(p) = g.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = g.toByte
      }
    }
    MediaBlob(id, "image", pngEncode(width, height, rgb))
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
    // 2²⁴ per edge: far beyond any real image, small enough that no
    // downstream size product can wrap an Int
    if (w <= 0 || h <= 0 || w > (1 << 24) || h > (1 << 24))
      return BadPng.copy(media_id = id)
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

  /** FULL pixel decode of an 8-bit truecolor non-interlaced PNG:
    * concatenate the IDAT payloads, inflate, and reverse the per-row
    * filter (all five PNG filter types — None/Sub/Up/Average/Paeth —
    * so PNGs from ANY conforming encoder decode, not just this file's
    * filter-0 writer; the spec round-trips a JDK-ImageIO-encoded
    * image to prove it). Returns (width, height, RGB triplets) or
    * None for anything [[parsePng]] rejects plus unsupported shapes
    * (palette/gray/alpha color types, 16-bit depth, Adam7 interlace,
    * inflate errors, short pixel data).
    */
  def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val meta = parsePng(0L, bytes)
    if (!meta.decode_ok || meta.bit_depth != 8 || meta.color_type != 2)
      return None
    // IHDR method bytes: compression (26) and filter method (27) have
    // exactly one legal value each — decoding anything else as
    // method-0 would return WRONG pixels with decode_ok=true —
    // and interlace (28) must be none (no Adam7)
    if (bytes(26) != 0 || bytes(27) != 0 || bytes(28) != 0) return None
    val (w, h) = (meta.width, meta.height)
    // bound the allocation BEFORE sizing arrays: a crafted IHDR can
    // declare dimensions whose raw size wraps Int (negative-size
    // crash) or demands a multi-GB buffer — both must stay a row
    // property, never a task failure
    val rawLen = h.toLong * (1L + w.toLong * 3)
    if (rawLen > (1L << 28)) return None
    // gather IDAT payloads (parsePng already validated the walk)
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val bos = new java.io.ByteArrayOutputStream()
    var off = 33
    var stop = false
    while (!stop && off + 8 <= bytes.length) {
      val size = buf.getInt(off)
      val cid = new String(bytes, off + 4, 4, "US-ASCII")
      if (cid == "IDAT") bos.write(bytes, off + 8, size)
      if (cid == "IEND") stop = true
      off += 12 + size
    }
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(bos.toByteArray)
    val rowBytes = w * 3
    val raw = new Array[Byte](h * (1 + rowBytes))
    val ok = try {
      var got = 0
      var stalled = false
      while (!stalled && got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // n == 0 with output space remaining and not finished means NO
        // progress is possible: truncated input (needsInput) or a
        // preset-dictionary request (needsDictionary — forbidden by
        // the PNG spec but craftable; looping on it would hang the
        // task forever). Either way: a malformed blob, not an error.
        if (n == 0) stalled = true else got += n
      }
      !stalled && got == raw.length
    } catch { case _: java.util.zip.DataFormatException => false }
    finally inflater.end()
    if (!ok) return None
    // reverse the row filters in place (bpp = 3 for 8-bit RGB)
    val px = new Array[Byte](h * rowBytes)
    def u(b: Byte): Int = b & 0xff
    (0 until h).foreach { r =>
      val f = raw(r * (1 + rowBytes))
      val src = r * (1 + rowBytes) + 1
      val dst = r * rowBytes
      (0 until rowBytes).foreach { i =>
        val a = if (i >= 3) u(px(dst + i - 3)) else 0          // left
        val b = if (r > 0) u(px(dst - rowBytes + i)) else 0    // up
        val c = if (r > 0 && i >= 3) u(px(dst - rowBytes + i - 3))
                else 0                                          // up-left
        val x = u(raw(src + i))
        val recon = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case _ => return None // unknown filter type
        }
        px(dst + i) = (recon & 0xff).toByte
      }
    }
    Some((w, h, px))
  }

  /** REAL nearest-neighbor resize on the container bytes — the
    * byte-level counterpart of the [[resizeSpec]] metadata plan, like
    * [[sampleFramesY4m]] is to [[frameSample]]: decode pixels, sample,
    * re-encode through [[pngEncode]]. Never upscales (the resizeSpec
    * rule): an image already within `maxEdge` returns its ORIGINAL
    * bytes untouched. Target dims use exact integer arithmetic —
    * `w' = max(1, w·maxEdge / max(w,h))` in longs — so any engine
    * replays them without float-floor hazards; source pixel for
    * (x, y) is (x·w / w', y·h / h'), the standard floor mapping.
    * Returns None where [[decodePngPixels]] does.
    */
  def resizePng(bytes: Array[Byte], maxEdge: Int): Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodePngPixels(bytes).map { case (w, h, px) =>
      val m = math.max(w, h)
      if (m <= maxEdge) (w, h, bytes)
      else {
        val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
        val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
        val out = new Array[Byte](w2 * h2 * 3)
        (0 until h2).foreach { y =>
          val sy = (y.toLong * h / h2).toInt
          (0 until w2).foreach { x =>
            val sx = (x.toLong * w / w2).toInt
            System.arraycopy(px, (sy * w + sx) * 3, out,
              (y * w2 + x) * 3, 3)
          }
        }
        (w2, h2, pngEncode(w2, h2, out))
      }
    }
  }

  /** Partition-wise blob resize: one decoder per partition, blobs
    * never shuffle; undecodable blobs come back with EMPTY content so
    * the downstream [[decodePng]] routes them to `decode_ok = false`
    * (the failure stays a row property, never a task failure).
    */
  def resizePngBlobs(blobs: Dataset[MediaBlob],
                     maxEdge: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      resizePng(b.content, maxEdge) match {
        case Some((_, _, out)) => MediaBlob(b.media_id, b.media_type, out)
        case None => MediaBlob(b.media_id, b.media_type,
          Array.emptyByteArray)
      }
    })
  }

  // ---------------------------------------------------------- pHash

  /** Scaled-integer luma block sums on a `gw × gh` grid over a decoded
    * RGB image: pixel (x,y) belongs to block (x·gw/w, y·gh/h) (the
    * standard floor mapping, so no divisibility constraint on dims),
    * luma is the BT.601 integer form 299·R + 587·G + 114·B kept ×1000
    * — all sums exact longs, so every downstream mean comparison can
    * cross-multiply instead of divide and any engine replays it
    * bit-free. Returns (blockSum, blockCount) arrays in row-major
    * block order, or None where [[decodeImagePixels]] rejects —
    * format-dispatched, so PNG, JPEG, GIF and WebP-VP8L blobs all
    * hash through the same kernel.
    */
  private def lumaBlockSums(bytes: Array[Byte], gw: Int, gh: Int)
      : Option[(Array[Long], Array[Long])] =
    decodeImagePixels(bytes).flatMap { case (w, h, px) =>
      if (w < gw || h < gh) None
      else {
        val sums = new Array[Long](gw * gh)
        val counts = new Array[Long](gw * gh)
        var y = 0
        while (y < h) {
          val by = y * gh / h
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            val luma = 299L * (px(p) & 0xff) + 587L * (px(p + 1) & 0xff) +
              114L * (px(p + 2) & 0xff)
            val b = by * gw + x * gw / w
            sums(b) += luma
            counts(b) += 1
            x += 1
          }
          y += 1
        }
        Some((sums, counts))
      }
    }

  /** Average hash (aHash): bit `i` set iff block `i`'s mean luma
    * exceeds the whole image's mean, decided by exact cross-
    * multiplication (`sum_i · totalPixels > total · count_i`). The
    * cheapest of the perceptual-hash family and the classic first
    * pass of image near-dup detection in crawl curation — invariant
    * to resizing and mild noise, 64 bits on the default 8×8 grid.
    */
  def aHashBits(bytes: Array[Byte], grid: Int = 8): Option[Array[Boolean]] =
    lumaBlockSums(bytes, grid, grid).map { case (sums, counts) =>
      val total = sums.sum
      val pixels = counts.sum
      Array.tabulate(grid * grid) { i =>
        sums(i) * pixels > total * counts(i)
      }
    }

  /** Difference hash (dHash): blocks on a `(grid+1) × grid` grid, bit
    * `(cy·grid + cx)` set iff the block right of `(cx, cy)` is
    * brighter (cross-multiplied mean compare again). Encodes the
    * horizontal gradient structure, which survives brightness shifts
    * that flip aHash bits — the standard complement to aHash.
    */
  def dHashBits(bytes: Array[Byte], grid: Int = 8): Option[Array[Boolean]] =
    lumaBlockSums(bytes, grid + 1, grid).map { case (sums, counts) =>
      Array.tabulate(grid * grid) { i =>
        val cy = i / grid; val cx = i % grid
        val l = cy * (grid + 1) + cx
        sums(l + 1) * counts(l) > sums(l) * counts(l + 1)
      }
    }


  /** Both perceptual hashes per blob as bit rows — partition-wise,
    * blobs never shuffle, undecodable blobs yield no rows (the decode
    * seam owns reporting them).
    */
  def imageHashBits(blobs: Dataset[MediaBlob],
                    grid: Int = 8): Dataset[ImageHashBit] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val a = aHashBits(b.content, grid).iterator.flatMap(_.zipWithIndex
        .map { case (bit, i) => ImageHashBit(b.media_id, "a", i, bit) })
      val d = dHashBits(b.content, grid).iterator.flatMap(_.zipWithIndex
        .map { case (bit, i) => ImageHashBit(b.media_id, "d", i, bit) })
      a ++ d
    })
  }

  /** Perceptual near-dup pairs by banded aHash: pack the 64 aHash
    * bits into a long per image (one decode pass, partition-wise),
    * split it into four 16-bit bands, and self-join on exact band
    * match — for `maxHamming ≤ 3` the pigeonhole makes banding
    * LOSSLESS (≤3 differing bits can dirty ≤3 of 4 bands), so the
    * result is provably ALL pairs within the hamming budget, found
    * with one shuffle on (band_no, band_value) instead of an O(n²)
    * cross join: the same candidate-generation shape as
    * [[graft.operators.Dedup.simhashCandidates]], on image bytes
    * instead of text shingles. Hamming distance itself is codegen'd
    * `bit_count(a ^ b)`.
    */
  def imageNearDupPairs(blobs: Dataset[MediaBlob], maxHamming: Int,
                        grid: Int = 8): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole guarantees losslessness only to hamming 3")
    import blobs.sparkSession.implicits._
    val hashes = blobs.mapPartitions(_.flatMap { b =>
      aHashBits(b.content, grid).map { bits =>
        var hash = 0L
        bits.zipWithIndex.foreach { case (bit, i) =>
          if (bit) hash |= 1L << i
        }
        (b.media_id, hash, (hash >>> 0) & 0xffffL, (hash >>> 16) & 0xffffL,
          (hash >>> 32) & 0xffffL, (hash >>> 48) & 0xffffL)
      }
    }).toDF("media_id", "hash", "b0", "b1", "b2", "b3")
    val banded = hashes.select(col("media_id"), col("hash"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band_no", "band_val")))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band_no") === col("y.band_no") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        col("x.hash").as("ha"), col("y.hash").as("hb"))
      .distinct()
    pairs
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
