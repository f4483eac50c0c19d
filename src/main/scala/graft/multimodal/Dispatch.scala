package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Unified dispatch row: `format` is the sniffed container; fields
  * a codec doesn't carry hold -1 (channels doubles as JPEG's
  * component count — both answer "how many interleaved planes").
  */
case class DispatchedMeta(media_id: Long, format: String,
                          decode_ok: Boolean, width: Int, height: Int,
                          sample_rate: Int, channels: Int, frames: Int,
                          duration_ms: Long)

/** Pixel-level image quality sums — INTEGER-exact so every engine
  * (and the DuckDB oracle) reproduces them bit-for-bit: `sum_luma` /
  * `sum_luma_sq` over BT.601 integer luma (mean/contrast derive
  * downstream as ratios), `lap_sq_sum` the 4-neighbor Laplacian
  * energy over interior pixels — the classic blur detector (a sharp
  * image has high energy; a blurred or flat one collapses toward 0).
  */
case class ImageQuality(media_id: Long, width: Int, height: Int,
                        sum_luma: Long, sum_luma_sq: Long,
                        lap_sq_sum: Long, decode_ok: Boolean)

/** Heterogeneous dispatch: magic-byte sniff routing each blob to its codec parser/transcoder in one partition-wise pass.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait DispatchCodec extends Serializable
    with WavCodec with PngCodec with Y4mCodec with JpegCodec
    with WebImageCodec with Vp8lCodec with Vp8Codec with BrotliCodec
    with CompressionCodec with Mp4Codec with AudioCodec
    with MpegTsCodec {
  // HETEROGENEOUS — one blob column carrying WAV next to PNG next to
  // JPEG next to Y4M. Each decode operator above assumes a homogeneous
  // column; dispatchDecode is the missing composition: sniff the magic
  // bytes, route each blob to its codec's parser, surface one unified
  // row. One partition-wise pass, blobs never shuffle, unknown or
  // corrupted magic stays a row property (format='unknown',
  // decode_ok=false) — never a task failure.
  // ------------------------------------------------------------------


  /** Container sniff by magic bytes alone (never by extension or a
    * type column — crawl metadata lies): RIFF/WAVE and RIFF/WEBP
    * (disambiguated by the form type at offset 8), the 8-byte PNG
    * signature, JPEG SOI, GIF87a/GIF89a, the YUV4MPEG2 tag. Anything
    * else — including a single flipped byte in a real header — is
    * "unknown".
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def ascii(off: Int, n: Int): String =
      if (bytes.length >= off + n) new String(bytes, off, n, "US-ASCII")
      else ""
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 12 && ascii(0, 4) == "RIFF" &&
      ascii(8, 4) == "WAVE") "wav"
    else if (bytes.length >= 12 && ascii(0, 4) == "RIFF" &&
      ascii(8, 4) == "WEBP") "webp"
    else if (bytes.length >= 8 && u(0) == 0x89 && ascii(1, 3) == "PNG" &&
      u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a && u(7) == 0x0a) "png"
    else if (bytes.length >= 2 && u(0) == 0xff && u(1) == 0xd8) "jpeg"
    else if (bytes.length >= 6 &&
      (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a")) "gif"
    else if (bytes.length >= 9 && ascii(0, 9) == "YUV4MPEG2") "y4m"
    // ISO-BMFF: the ftyp box type at offset 4 (its 4-byte size
    // varies); AVIF/HEIF images are the same container discriminated
    // by major brand
    else if (bytes.length >= 12 && ascii(4, 4) == "ftyp") {
      val brand = if (bytes.length >= 16) ascii(8, 4) else ""
      if (brand == "avif" || brand == "avis") "avif"
      else if (brand == "heic" || brand == "heix" || brand == "mif1")
        "heif"
      else "mp4"
    }
    else if (bytes.length >= 18 && u(0) == 0x1f && u(1) == 0x8b) "gzip"
    // the other dump codecs: XZ (.tar.xz drops) and bzip2 (classic
    // wiki/corpus exports) — 6- and 4-byte leading magics
    else if (bytes.length >= 12 && u(0) == 0xfd && ascii(1, 4) == "7zXZ" &&
      u(5) == 0) "xz"
    else if (bytes.length >= 10 && ascii(0, 3) == "BZh" &&
      bytes(3) >= '1' && bytes(3) <= '9') "bzip2"
    // archive envelopes: ZIP local-header magic; USTAR's magic sits
    // at offset 257 (tar has no leading signature at all)
    else if (bytes.length >= 30 && ascii(0, 2) == "PK" &&
      u(2) == 3 && u(3) == 4) "zip"
    else if (bytes.length >= 32 && ascii(0, 2) == "7z" &&
      u(2) == 0xbc && u(3) == 0xaf && u(4) == 0x27 && u(5) == 0x1c)
      "7z"
    else if (bytes.length >= 262 && ascii(257, 5) == "ustar") "tar"
    // BMP: "BM" is weak 2-byte magic — require a known info-header
    // size (BITMAPINFOHEADER/V4/V5) before the stronger signatures
    // below lose their shot
    else if (bytes.length >= 54 && ascii(0, 2) == "BM" &&
      (u(14) == 40 || u(14) == 108 || u(14) == 124) && u(15) == 0 &&
      u(16) == 0 && u(17) == 0) "bmp"
    // TIFF: both byte orders' 4-byte signatures
    else if (bytes.length >= 8 &&
      ((ascii(0, 2) == "II" && u(2) == 42 && u(3) == 0) ||
        (ascii(0, 2) == "MM" && u(2) == 0 && u(3) == 42))) "tiff"
    else if (bytes.length >= 4 && ascii(0, 4) == "fLaC") "flac"
    else if (bytes.length >= 5 && ascii(0, 4) == "OggS" && u(4) == 0)
      "ogg"
    // MPEG-TS: 0x47 sync at two consecutive 188-byte boundaries (one
    // alone is a weak single byte)
    else if (bytes.length >= 377 && u(0) == 0x47 && u(188) == 0x47 &&
      (bytes.length < 565 || u(376) == 0x47)) "mp2t"
    // MPEG audio: an ID3v2 tag, or a bare frame sync with non-reserved
    // version/layer bits (checked LAST — the sync pattern is the
    // weakest magic in the chain; every stronger signature wins first)
    else if (bytes.length >= 3 && ascii(0, 3) == "ID3") "mp3"
    // ADTS AAC: the same 0xFFF sync family but with LAYER 00 (reserved
    // for MP3) — must be told apart before the generic MPEG-audio test
    else if (bytes.length >= 7 && u(0) == 0xff && (u(1) & 0xf6) == 0xf0)
      "aac"
    else if (bytes.length >= 4 && u(0) == 0xff && (u(1) & 0xe0) == 0xe0 &&
      ((u(1) >> 3) & 0x3) != 1 && ((u(1) >> 1) & 0x3) != 0) "mp3"
    else "unknown"
  }

  /** Route one blob through its sniffed codec's parser. A recognized
    * container with a broken body (truncated WAV data chunk, JPEG with
    * no EOI) keeps its `format` and reports decode_ok=false — the
    * sniff and the parse are separate facts and both are useful
    * signals when triaging a crawl.
    */
  def dispatchOne(id: Long, bytes: Array[Byte]): DispatchedMeta =
    sniffFormat(bytes) match {
      case "wav" =>
        val w = parseWav(id, bytes)
        DispatchedMeta(id, "wav", w.decode_ok, -1, -1, w.sample_rate,
          w.channels, -1, w.duration_ms)
      case "png" =>
        val p = parsePng(id, bytes)
        DispatchedMeta(id, "png", p.decode_ok, p.width, p.height, -1,
          -1, -1, -1L)
      case "jpeg" =>
        val j = parseJpeg(id, bytes)
        DispatchedMeta(id, "jpeg", j.decode_ok, j.width, j.height, -1,
          j.components, -1, -1L)
      case "y4m" =>
        val y = parseY4m(id, bytes)
        DispatchedMeta(id, "y4m", y.decode_ok, y.width, y.height, -1,
          -1, y.frames, y.duration_ms)
      case "webp" =>
        val wp = parseWebp(id, bytes)
        DispatchedMeta(id, "webp", wp.decode_ok, wp.width, wp.height,
          -1, -1, wp.frame_count, wp.anim_duration_ms)
      case "gif" =>
        val g = parseGif(id, bytes)
        DispatchedMeta(id, "gif", g.decode_ok, g.width, g.height, -1,
          -1, g.frame_count, g.duration_cs * 10L)
      case "mp4" =>
        val v = parseMp4(id, bytes)
        // channels doubles as track count here — both answer "how
        // many interleaved streams" (the DispatchedMeta contract)
        DispatchedMeta(id, "mp4", v.decode_ok, v.width, v.height, -1,
          if (v.decode_ok) v.n_tracks else -1, -1, v.duration_ms)
      case k @ ("avif" | "heif") =>
        // image sibling of the mp4 metadata leg: HEIF item walk;
        // channels doubles as the iinf item count, frames as bit
        // depth (AV1 payload decode is out of scope, like H.264)
        val a = parseAvif(id, bytes)
        DispatchedMeta(id, k, a.decode_ok, a.width, a.height, -1,
          if (a.decode_ok) a.n_items else -1,
          if (a.decode_ok) a.depth else -1, -1L)
      case "gzip" =>
        // container-only leg: decode_ok = the member inflates clean
        DispatchedMeta(id, "gzip", gunzip(bytes).isDefined, -1, -1,
          -1, -1, -1, -1L)
      case "xz" =>
        DispatchedMeta(id, "xz", unxz(bytes).isDefined, -1, -1,
          -1, -1, -1, -1L)
      case "7z" =>
        val rows = graft.sources.SevenZip.parse(id, bytes)
        DispatchedMeta(id, "7z", rows.forall(_.ok), -1, -1, -1, -1,
          if (rows.forall(_.ok)) rows.length else -1, -1L)
      case "bzip2" =>
        DispatchedMeta(id, "bzip2", unbzip2(bytes).isDefined, -1, -1,
          -1, -1, -1, -1L)
      case "zip" =>
        // envelope leg: decode_ok = every member extracts and
        // checksums clean; frames doubles as the member count (the
        // DispatchedMeta contract: "how many things inside")
        val es = graft.sources.Zip.parse(id, bytes)
        val clean = es.forall(e => e.ok && e.crc_ok)
        DispatchedMeta(id, "zip", clean, -1, -1, -1, -1,
          if (clean) es.length else -1, -1L)
      case "tar" =>
        val es = graft.sources.Tar.parse(id, bytes)
        val clean = es.forall(_.ok)
        DispatchedMeta(id, "tar", clean, -1, -1, -1, -1,
          if (clean) es.length else -1, -1L)
      case "mp3" =>
        val a = parseMp3(id, bytes)
        DispatchedMeta(id, "mp3", a.decode_ok, -1, -1, a.sample_rate,
          a.channels, -1, a.duration_ms)
      case "aac" =>
        val a = parseAdts(id, bytes)
        DispatchedMeta(id, "aac", a.decode_ok, -1, -1, a.sample_rate,
          a.channels, a.frames.toInt, a.duration_ms)
      case "bmp" =>
        decodeBmpPixels(bytes) match {
          case Some((w, h, _)) =>
            DispatchedMeta(id, "bmp", decode_ok = true, w, h, -1, -1,
              -1, -1L)
          case None =>
            DispatchedMeta(id, "bmp", decode_ok = false, -1, -1, -1,
              -1, -1, -1L)
        }
      case "tiff" =>
        decodeTiffPixels(bytes) match {
          case Some((w, h, _)) =>
            DispatchedMeta(id, "tiff", decode_ok = true, w, h, -1, -1,
              -1, -1L)
          case None =>
            DispatchedMeta(id, "tiff", decode_ok = false, -1, -1, -1,
              -1, -1, -1L)
        }
      case "mp2t" =>
        // channels doubles as the elementary-stream count; duration
        // from the first stream's PTS span (90 kHz → ms)
        val ts = parseMpegTs(id, bytes)
        val ok = ts.forall(_.ok)
        val dur = ts.headOption
          .filter(s => s.ok && s.first_pts >= 0)
          .map(s => (s.last_pts - s.first_pts) / 90L).getOrElse(-1L)
        DispatchedMeta(id, "mp2t", ok, -1, -1, -1,
          if (ok) ts.length else -1,
          if (ok) ts.map(_.ts_packets).sum.toInt else -1, dur)
      case "flac" =>
        val fl = parseFlac(id, bytes)
        DispatchedMeta(id, "flac", fl.decode_ok, -1, -1, fl.sample_rate,
          fl.channels, -1, fl.duration_ms)
      case "ogg" =>
        val og = parseOgg(id, bytes)
        DispatchedMeta(id, "ogg", og.decode_ok, -1, -1, og.sample_rate,
          og.channels, -1, og.duration_ms)
      case _ =>
        DispatchedMeta(id, "unknown", decode_ok = false, -1, -1, -1,
          -1, -1, -1L)
    }

  /** Partition-wise heterogeneous decode — the same plan shape as the
    * homogeneous operators ([[decodeWav]]/[[decodePng]]/...): one
    * sniffer+parser pass per partition, blobs never shuffle.
    */
  /** FULL-pixel image quality metrics for the curation gate a crawl
    * image column needs (LAION-style triage: drop flat/blurred/
    * near-empty images before paying for embedding them): decode the
    * blob (PNG or JPEG by magic), reduce to BT.601 integer luma
    * `(299r + 587g + 114b) / 1000`, and emit INTEGER sums — total
    * luma, total squared luma, and the 4-neighbor Laplacian energy
    * `Σ (4p − N − S − E − W)²` over interior pixels. Integer
    * arithmetic end-to-end: the sums hash-match any engine that
    * replays the pixel formula (q192's oracle does, from the
    * generator), and downstream derives mean / variance (contrast) /
    * per-pixel blur score as ratios. Undecodable blobs are a
    * sentinel row, never a task failure.
    */
  /** Magic-sniffed pixel decode over every container with a pixel
    * decoder in this repo — the concrete [[PngCodec.decodeImagePixels]]
    * every pixel-level operator (perceptual hashes, near-dup pairs,
    * quality stats) routes through. A recognized container whose body
    * a decoder rejects (interlaced PNG, foreign-table VP8, …) returns None —
    * a row property, never a task failure.
    */
  override def decodeImagePixels(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] =
    sniffFormat(bytes) match {
      case "png"  => decodePngPixels(bytes)
      case "jpeg" => decodeJpegRgb(bytes)
      case "gif"  => decodeGifPixels(bytes)
      case "webp" => decodeWebpPixels(bytes)
      case "bmp"  => decodeBmpPixels(bytes)
      case "tiff" => decodeTiffPixels(bytes)
      case _      => None
    }

  def imageQualityOne(id: Long, bytes: Array[Byte]): ImageQuality = {
    val decoded = decodeImagePixels(bytes)
    decoded match {
      case Some((w, h, rgb)) =>
        val luma = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val p = i * 3
          luma(i) = ((rgb(p) & 0xff) * 299 + (rgb(p + 1) & 0xff) * 587 +
            (rgb(p + 2) & 0xff) * 114) / 1000
          i += 1
        }
        var s = 0L
        var s2 = 0L
        i = 0
        while (i < luma.length) {
          s += luma(i); s2 += luma(i).toLong * luma(i); i += 1
        }
        var lap2 = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val l = 4L * luma(y * w + x) - luma(y * w + x - 1) -
              luma(y * w + x + 1) - luma((y - 1) * w + x) -
              luma((y + 1) * w + x)
            lap2 += l * l
            x += 1
          }
          y += 1
        }
        ImageQuality(id, w, h, s, s2, lap2, decode_ok = true)
      case None =>
        ImageQuality(id, -1, -1, -1L, -1L, -1L, decode_ok = false)
    }
  }

  /** Partition-wise image quality — the [[dispatchDecode]] contract:
    * one decoder pass, blobs never shuffle, exchanges move the
    * integer sums only.
    */
  def imageQualityStats(blobs: Dataset[MediaBlob])
      : Dataset[ImageQuality] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => imageQualityOne(b.media_id,
      b.content)))
  }

  def dispatchDecode(blobs: Dataset[MediaBlob]): Dataset[DispatchedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => dispatchOne(b.media_id, b.content)))
  }

  /** [[PngCodec.resizePng]]'s exact contract on the GIF container:
    * decode (first frame), nearest-neighbor sample with the shared
    * integer floor mapping, re-encode. NN sampling picks ORIGINAL
    * pixels, so the output colors are a subset of the source palette
    * (≤ 256 by construction) and the re-encode is pixel-exact — no
    * quantization ever. Never upscales (within-budget images return
    * their original bytes); animated GIFs resize to their first
    * frame (the poster-frame rule of a transcode stage). None where
    * [[WebImageCodec.decodeGifPixels]] rejects.
    */
  def resizeGif(bytes: Array[Byte],
                maxEdge: Int): Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodeGifPixels(bytes).flatMap { case (w, h, px) =>
      val m = math.max(w, h)
      if (m <= maxEdge) Some((w, h, bytes))
      else {
        val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
        val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
        val colorIdx = new java.util.LinkedHashMap[Int, Integer]()
        val indices = new Array[Byte](w2 * h2)
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            val p = (sy * w + sx) * 3
            val c = ((px(p) & 0xff) << 16) | ((px(p + 1) & 0xff) << 8) |
              (px(p + 2) & 0xff)
            var idx = colorIdx.get(c)
            if (idx == null) {
              idx = Integer.valueOf(colorIdx.size)
              colorIdx.put(c, idx)
            }
            indices(y * w2 + x) = idx.intValue.toByte
            x += 1
          }
          y += 1
        }
        val n = colorIdx.size
        if (n > 256) None // unreachable for a decoded GIF source
        else {
          var padded = 2
          while (padded < n) padded <<= 1
          val palette = new Array[Byte](padded * 3)
          val it = colorIdx.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getKey.intValue
            val i = e.getValue.intValue
            palette(i * 3) = ((c >> 16) & 0xff).toByte
            palette(i * 3 + 1) = ((c >> 8) & 0xff).toByte
            palette(i * 3 + 2) = (c & 0xff).toByte
          }
          Some((w2, h2, gifEncode(w2, h2, indices, palette)))
        }
      }
    }
  }

  /** The WebP leg of the resize family: pixel decode (VP8L, or the
    * VP8 keyframe codec via [[Vp8lCodec.decodeWebpPixels]]'s lossy
    * fallback), the shared NN floor mapping, VP8L re-encode
    * (SUBTRACT_GREEN + LZ77) — so a lossy source transcodes to
    * lossless on the way down, and the resized pixels stay exact.
    * Undecodable bodies return None.
    */
  /** BMP leg of the resize family: decode (24/32-bit or paletted),
    * NN floor-map, 24-bit BI_RGB re-encode — exact like its siblings
    */
  def resizeBmp(bytes: Array[Byte],
                maxEdge: Int): Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodeBmpPixels(bytes).map { case (w, h, px) =>
      val m = math.max(w, h)
      if (m <= maxEdge) (w, h, bytes)
      else {
        val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
        val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
        val out = new Array[Byte](w2 * h2 * 3)
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            System.arraycopy(px, (sy * w + sx) * 3, out,
              (y * w2 + x) * 3, 3)
            x += 1
          }
          y += 1
        }
        (w2, h2, bmpEncode(w2, h2, out))
      }
    }
  }

  /** TIFF leg of the resize family: baseline decode, NN floor-map,
    * single-strip RGB re-encode — exact like its siblings
    */
  def resizeTiff(bytes: Array[Byte],
                 maxEdge: Int): Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodeTiffPixels(bytes).map { case (w, h, px) =>
      val m = math.max(w, h)
      if (m <= maxEdge) (w, h, bytes)
      else {
        val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
        val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
        val out = new Array[Byte](w2 * h2 * 3)
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            System.arraycopy(px, (sy * w + sx) * 3, out,
              (y * w2 + x) * 3, 3)
            x += 1
          }
          y += 1
        }
        (w2, h2, tiffEncode(w2, h2, out))
      }
    }
  }

  def resizeWebp(bytes: Array[Byte],
                 maxEdge: Int): Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodeWebpPixels(bytes).map { case (w, h, px) =>
      val m = math.max(w, h)
      if (m <= maxEdge) (w, h, bytes)
      else {
        val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
        val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
        val argb = new Array[Int](w2 * h2)
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            val p = (sy * w + sx) * 3
            argb(y * w2 + x) = (0xff << 24) | ((px(p) & 0xff) << 16) |
              ((px(p + 1) & 0xff) << 8) | (px(p + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        (w2, h2, vp8lEncode(w2, h2, argb, subtractGreen = true,
          lz77 = true))
      }
    }
  }

  /** Heterogeneous blob TRANSCODE — [[dispatchDecode]]'s composition
    * with the per-modality transforms: sniff each blob's container and
    * apply the right downscale in the SAME partition-wise pass —
    * images ([[resizePng]]/[[resizeJpeg]]) to `maxEdge`, audio
    * ([[transcodeWav]]) to `targetRate`(+`mono`), video
    * ([[transcodeY4m]]) to every-`every`-th frame at `maxEdge`. This
    * is the one-operator form of a multimodal curation stage over a
    * 100 TB crawl column: blobs never shuffle, each emits exactly one
    * output blob, and unknown containers or undecodable bodies come
    * back with EMPTY content so a downstream [[dispatchDecode]]
    * reports them as `decode_ok=false` row properties — never a task
    * failure. Each codec's own never-upsample / never-approximate
    * pass-through rules apply unchanged.
    */
  def dispatchTranscode(blobs: Dataset[MediaBlob], maxEdge: Int,
                        targetRate: Int, mono: Boolean,
                        every: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val out = sniffFormat(b.content) match {
        case "wav"  => transcodeWav(b.content, targetRate, mono)
        case "png"  => resizePng(b.content, maxEdge).map(_._3)
        case "jpeg" => resizeJpeg(b.content, maxEdge).map(_._3)
        case "y4m"  => transcodeY4m(b.content, every, maxEdge)
        case "gif"  => resizeGif(b.content, maxEdge).map(_._3)
        case "bmp"  => resizeBmp(b.content, maxEdge).map(_._3)
        case "tiff" => resizeTiff(b.content, maxEdge).map(_._3)
        // lossless AND lossy single-frame WebP resize (the lossy leg
        // decodes through the VP8 keyframe codec and re-encodes as
        // VP8L); VP8X wrappers (possibly animations) pass through
        // unchanged; a broken body empties like PNG/JPEG
        case "webp" =>
          val variant = parseWebp(0L, b.content).variant
          if (variant == "VP8L" || variant == "VP8")
            resizeWebp(b.content, maxEdge).map(_._3)
          else Some(b.content)
        // metadata-only legs: no byte-level transform exists, so a
        // valid stream passes through (dropping it would silently
        // empty every MP4/MP3/FLAC/AVIF/archive in a mixed crawl
        // column)
        case "mp4" | "mp3" | "flac" | "ogg" | "avif" | "heif" |
          "xz" | "bzip2" | "7z" | "zip" | "tar" | "gzip" | "mp2t" |
          "aac" =>
          Some(b.content)
        case _      => None
      }
      MediaBlob(b.media_id, b.media_type,
        out.getOrElse(Array.emptyByteArray))
    })
  }
}
