package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

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

  /** Canonical 44-byte PCM header (RIFF size, WAVE, `fmt ` 16-byte
    * block, `data` chunk) into a fresh buffer sized for `dataLen`
    * payload bytes — the ONE copy of the header layout behind both
    * synthetic writers.
    */
  private def wavHeader(sampleRate: Int, channels: Int,
                        bitsPerSample: Int,
                        dataLen: Int): java.nio.ByteBuffer = {
    val blockAlign = channels * bitsPerSample / 8
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
    bb
  }

  /** Minimal RIFF/WAVE writer: canonical PCM header + deterministic
    * payload. WAV is the reference's actual blob type
    * (tts_utils.py:31-35 writes synthesized speech as wav) — these
    * are REAL wav bytes any audio tool would accept, generated
    * without audio libraries.
    */
  def syntheticWav(id: Long, sampleRate: Int, channels: Int,
                   bitsPerSample: Int, nFrames: Int): MediaBlob = {
    val dataLen = nFrames * channels * bitsPerSample / 8
    val bb = wavHeader(sampleRate, channels, bitsPerSample, dataLen)
    var x = id
    (0 until dataLen).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      bb.put((x >>> 56).toByte)
    }
    MediaBlob(id, "audio", bb.array())
  }

  /** The ONE RIFF chunk walk shared by [[parseWav]] and [[wavStats]]
    * (a coupled second copy would have to stay byte-identical or the
    * stats path could step to offsets the parse never validated).
    * Returns (fmt fields, data-chunk body offset, data length) —
    * fmt = (channels, rate, byteRate, bits); dataOff/dataLen are −1
    * when absent. Any malformation just ends the walk: a declared
    * size past EOF, or one whose Int form is negative or whose step
    * sum would WRAP Int (bounds compared in Long — a crafted
    * size near 2³¹ once defeated an Int-arithmetic EOF guard and
    * walked to a negative offset).
    */
  private def wavChunkWalk(bytes: Array[Byte])
      : (Option[(Int, Int, Int, Int)], Int, Long) = {
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataOff = -1
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
          dataOff = body; dataLen = size
        case _ => // unknown/short chunk: skip
      }
      val step = size.toInt
      if (step < 0 || body.toLong + step > bytes.length)
        off = bytes.length
      else off = body + step + (step & 1) // chunks pad to even
    }
    (fmt, dataOff, dataLen)
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
    if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
      return BadWav.copy(media_id = id)
    wavChunkWalk(bytes) match {
      case (Some((ch, rate, byteRate, bits)), _, dataLen)
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

  /** REAL wav bytes from caller-provided interleaved 16-bit PCM
    * samples — the generator-parameterized twin of [[syntheticWav]]
    * (which fills the payload from an id-seeded LCG), for callers
    * that need arithmetically-derivable sample values.
    */
  def syntheticWavPcm(id: Long, sampleRate: Int, channels: Int,
                      samples: Array[Short]): MediaBlob = {
    require(samples.length % channels == 0)
    val bb = wavHeader(sampleRate, channels, bitsPerSample = 16,
      dataLen = samples.length * 2)
    samples.foreach(bb.putShort)
    MediaBlob(id, "audio", bb.array())
  }

  case class WavStats(media_id: Long, channel: Int, n_samples: Long,
                      peak: Int, sum_abs: Long, sum_sq: Long,
                      decode_ok: Boolean)

  private val BadWavStats =
    WavStats(0L, -1, -1L, -1, -1L, -1L, decode_ok = false)

  /** Byte-level AUDIO feature extraction — the audio leg of the
    * real per-modality transforms ([[resizePng]] for images,
    * [[sampleFramesY4m]] for video): decode the 16-bit PCM samples
    * out of the container and fold per-channel signal statistics —
    * peak |amplitude|, sum of |s|, sum of s² (the loudness/energy
    * ingredients; all EXACT integers, so any engine replays them).
    * One row per channel. Reuses [[parseWav]]'s chunk walk for the
    * data location; anything it rejects — or a non-16-bit stream, or
    * a data length that splits a frame — routes to one
    * `decode_ok=false` row, never a task failure.
    */
  def wavStats(id: Long, bytes: Array[Byte]): Seq[WavStats] = {
    val meta = parseWav(id, bytes)
    if (!meta.decode_ok || meta.bits_per_sample != 16)
      return Seq(BadWavStats.copy(media_id = id))
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (2L * ch) != 0 ||
        meta.data_bytes > Int.MaxValue)
      return Seq(BadWavStats.copy(media_id = id))
    // the SAME walk parseWav ran (shared helper) hands back the data
    // chunk's body offset
    val (_, dataOff, _) = wavChunkWalk(bytes)
    if (dataOff < 0) return Seq(BadWavStats.copy(media_id = id))
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = (meta.data_bytes / (2L * ch)).toInt
    val peak = new Array[Int](ch)
    val sAbs = new Array[Long](ch)
    val sSq = new Array[Long](ch)
    var i = 0
    while (i < frames * ch) {
      val s = buf.getShort(dataOff + i * 2).toInt
      val c = i % ch
      val a = math.abs(s)
      if (a > peak(c)) peak(c) = a
      sAbs(c) += a
      sSq(c) += s.toLong * s
      i += 1
    }
    (0 until ch).map(c =>
      WavStats(id, c, frames.toLong, peak(c), sAbs(c), sSq(c),
        decode_ok = true))
  }

  /** Partition-wise per-channel stats over a Dataset of blobs — one
    * decoder per partition, blobs never shuffle, one output row per
    * (blob, channel).
    */
  def decodeWavStats(blobs: Dataset[MediaBlob]): Dataset[WavStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => wavStats(b.media_id, b.content)))
  }

  /** One fixed-length analysis window of a PCM stream: exact-integer
    * per-window signal statistics over all channels interleaved
    * (window boundaries are frame-aligned; `start_ms` floors
    * `window_no · winFrames · 1000 / rate` in long arithmetic).
    */
  case class WavWindow(media_id: Long, window_no: Int, start_ms: Long,
                       n_frames: Int, peak: Int, sum_abs: Long,
                       sum_sq: Long, decode_ok: Boolean)

  private val BadWavWindow =
    WavWindow(0L, -1, -1L, -1, -1, -1L, -1L, decode_ok = false)

  /** WINDOWED audio feature extraction — the audio counterpart of the
    * per-frame video features ([[frameFeatures]]): split the 16-bit
    * PCM stream into fixed `winFrames`-frame windows and fold each
    * window's peak / Σ|s| / Σs² across all channels — the
    * energy-contour shape a VAD or silence-trimming curation stage
    * consumes, one row per window. All EXACT integers (any engine
    * replays them); the trailing partial window IS emitted with its
    * real `n_frames` (energy contours must cover the tail — a
    * truncated last window is signal, not noise). Anything
    * [[parseWav]] rejects, non-16-bit, or a frame-splitting data
    * length → one `decode_ok=false` row. Partition-wise in the blob
    * variant: one decoder per partition, blobs never shuffle, windows
    * parallelize downstream work past the per-blob grain.
    */
  def wavWindows(id: Long, bytes: Array[Byte],
                 winFrames: Int): Seq[WavWindow] = {
    require(winFrames >= 1)
    val meta = parseWav(id, bytes)
    if (!meta.decode_ok || meta.bits_per_sample != 16)
      return Seq(BadWavWindow.copy(media_id = id))
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (2L * ch) != 0 ||
        meta.data_bytes > Int.MaxValue || meta.sample_rate <= 0)
      return Seq(BadWavWindow.copy(media_id = id))
    val (_, dataOff, _) = wavChunkWalk(bytes)
    if (dataOff < 0) return Seq(BadWavWindow.copy(media_id = id))
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = (meta.data_bytes / (2L * ch)).toInt
    val nWin = (frames + winFrames - 1) / winFrames
    (0 until nWin).map { w =>
      val f0 = w * winFrames
      val f1 = math.min(frames, f0 + winFrames)
      var peak = 0; var sAbs = 0L; var sSq = 0L
      var i = f0 * ch
      while (i < f1 * ch) {
        val s = buf.getShort(dataOff + i * 2).toInt
        val a = math.abs(s)
        if (a > peak) peak = a
        sAbs += a
        sSq += s.toLong * s
        i += 1
      }
      WavWindow(id, w, f0.toLong * 1000L / meta.sample_rate, f1 - f0,
        peak, sAbs, sSq, decode_ok = true)
    }
  }

  /** Partition-wise windowed features over a Dataset of blobs — one
    * decoder per partition, one output row per (blob, window).
    */
  def wavWindowsBlobs(blobs: Dataset[MediaBlob],
                      winFrames: Int): Dataset[WavWindow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b =>
      wavWindows(b.media_id, b.content, winFrames)))
  }

  /** Byte-level AUDIO transcode — the WAV leg of the resize family
    * ([[resizePng]] / [[resizeJpeg]] / [[resizeFramesY4m]]): decode
    * the 16-bit PCM frames, optionally fold the channels to mono and
    * decimate to `targetRate`, and re-emit genuine WAV bytes. The
    * speech-prep shape (16 kHz/8 kHz mono is what ASR/TTS training
    * corpora standardize on; the reference's audio blobs are TTS
    * WAVs, tts_utils.py:31-35).
    *
    * All arithmetic is EXACT INTEGER so any engine replays it:
    *  - mono mixdown: per frame, `floorDiv(sum over channels, ch)`;
    *  - decimation by integer factor `k = srcRate / targetRate`
    *    (only when `targetRate` divides `srcRate`): output frame j is
    *    the per-channel `floorDiv(sum of frames j·k .. j·k+k−1, k)` —
    *    a box pre-average, not bare sample-dropping, so energy above
    *    the target band folds instead of aliasing at full strength;
    *    a trailing partial group is dropped (`outFrames = frames/k`).
    *  - mixdown applies BEFORE decimation (the floors do not commute;
    *    this order is the contract and the oracle's replay).
    *
    * Never-upsample / never-approximate: `srcRate <= targetRate`
    * leaves the rate unchanged, and so does a `srcRate` that
    * `targetRate` does not divide UNLESS `fractional = true` — then
    * the non-divisible downsample (the single most common real
    * conversion: 44.1 kHz → 16 kHz, the ASR ingest rate for exactly
    * the reference's TTS wav blobs, tts_utils.py:31-35) runs an EXACT
    * fixed-point linear interpolation: output frame j sits at source
    * position j·S/T (S = srcRate, T = targetRate, pure rationals);
    * with i0 = (j·S) div T and rem = (j·S) mod T, the sample is
    * `floorDiv(s[i0]·(T−rem) + s[i0+1]·rem, T)` (s[i0] verbatim when
    * rem = 0) — all Long integer arithmetic, so any engine replays it
    * closed-form. outFrames = (frames−1)·T div S + 1, exactly the j
    * whose position lands inside the input. Divisible rates keep the
    * box decimation even with `fractional = true` (it is exact AND
    * pre-averages). If no transform applies at all the input bytes
    * pass through BYTE-IDENTICAL (extra RIFF chunks preserved).
    * Anything [[parseWav]] rejects, or a non-16-bit stream, or a data
    * length that splits a frame, returns None (the blob variant
    * routes that to empty content, the resize family's row-property
    * contract).
    */
  def transcodeWav(bytes: Array[Byte], targetRate: Int,
                   mono: Boolean,
                   fractional: Boolean = false): Option[Array[Byte]] = {
    require(targetRate >= 1)
    val meta = parseWav(0L, bytes)
    if (!meta.decode_ok || meta.bits_per_sample != 16) return None
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (2L * ch) != 0 ||
        meta.data_bytes > Int.MaxValue) return None
    val k = if (meta.sample_rate > targetRate &&
      meta.sample_rate % targetRate == 0) meta.sample_rate / targetRate
    else 1
    val frac = fractional && k == 1 && meta.sample_rate > targetRate
    val doMix = mono && ch > 1
    if (k == 1 && !doMix && !frac) return Some(bytes)
    val (_, dataOff, _) = wavChunkWalk(bytes)
    if (dataOff < 0) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = (meta.data_bytes / (2L * ch)).toInt
    val outCh = if (doMix) 1 else ch
    // mixdown first (exact: |sum| < 2^15·ch fits Int; floorDiv keeps
    // the short range), then box-average each k-group per channel
    val mixed = new Array[Int](frames * outCh)
    var f = 0
    while (f < frames) {
      if (doMix) {
        var s = 0
        var c = 0
        while (c < ch) { s += buf.getShort(dataOff + (f * ch + c) * 2); c += 1 }
        mixed(f) = Math.floorDiv(s, ch)
      } else {
        var c = 0
        while (c < ch) {
          mixed(f * outCh + c) = buf.getShort(dataOff + (f * ch + c) * 2)
          c += 1
        }
      }
      f += 1
    }
    if (frac) {
      // exact fixed-point linear interpolation (scaladoc formula)
      val srcR = meta.sample_rate
      val outFrames =
        if (frames == 0) 0
        else (((frames - 1).toLong * targetRate) / srcR + 1).toInt
      val fb = wavHeader(targetRate, outCh, bitsPerSample = 16,
        dataLen = outFrames * outCh * 2)
      var j = 0
      while (j < outFrames) {
        val num = j.toLong * srcR
        val i0 = (num / targetRate).toInt
        val rem = (num % targetRate).toInt
        var c = 0
        while (c < outCh) {
          val v =
            if (rem == 0) mixed(i0 * outCh + c)
            else Math.floorDiv(
              mixed(i0 * outCh + c).toLong * (targetRate - rem) +
                mixed((i0 + 1) * outCh + c).toLong * rem,
              targetRate).toInt
          fb.putShort(v.toShort)
          c += 1
        }
        j += 1
      }
      return Some(fb.array())
    }
    val outFrames = frames / k
    val outRate = if (k == 1) meta.sample_rate else targetRate
    val bb = wavHeader(outRate, outCh, bitsPerSample = 16,
      dataLen = outFrames * outCh * 2)
    var j = 0
    while (j < outFrames) {
      var c = 0
      while (c < outCh) {
        var s = 0
        var g = 0
        while (g < k) { s += mixed((j * k + g) * outCh + c); g += 1 }
        bb.putShort(Math.floorDiv(s, k).toShort)
        c += 1
      }
      j += 1
    }
    Some(bb.array())
  }

  /** Peak-normalize 16-bit PCM to `targetPeak` in EXACT rational
    * arithmetic — the gain stage of speech prep (corpora level loud
    * and quiet recordings before training): every sample becomes
    * `floorDiv(s · targetPeak, peak)` where `peak = max|s|` over ALL
    * channels (one gain per file — per-channel gains would break the
    * stereo image). Quiet audio amplifies, hot audio attenuates,
    * output is bounded by `targetPeak` by construction. Silent files
    * (peak 0) and files already at the target pass through
    * BYTE-IDENTICAL. Same rejection contract as [[transcodeWav]].
    */
  def normalizeWavPeak(bytes: Array[Byte],
                       targetPeak: Int): Option[Array[Byte]] = {
    require(targetPeak >= 1 && targetPeak <= 32767)
    val meta = parseWav(0L, bytes)
    if (!meta.decode_ok || meta.bits_per_sample != 16) return None
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (2L * ch) != 0 ||
      meta.data_bytes > Int.MaxValue) return None
    val (_, dataOff, _) = wavChunkWalk(bytes)
    if (dataOff < 0) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = (meta.data_bytes / 2L).toInt
    var peak = 0
    var i = 0
    while (i < n) {
      val a = math.abs(buf.getShort(dataOff + i * 2).toInt)
      if (a > peak) peak = a
      i += 1
    }
    if (peak == 0 || peak == targetPeak) return Some(bytes)
    val bb = wavHeader(meta.sample_rate, ch, bitsPerSample = 16,
      dataLen = n * 2)
    i = 0
    while (i < n) {
      val s = buf.getShort(dataOff + i * 2).toInt
      bb.putShort(Math.floorDiv(s.toLong * targetPeak, peak).toShort)
      i += 1
    }
    Some(bb.array())
  }

  /** Trim leading/trailing SILENCE from 16-bit PCM — the other half
    * of speech prep next to [[normalizeWavPeak]] (TTS/ASR corpora pad
    * both ends; training on padding wastes tokens): keep the frame
    * span from the FIRST to the LAST frame where any channel reaches
    * `threshold` in magnitude. Interior silence is preserved (pauses
    * are speech). A fully-silent file keeps its header with ZERO
    * frames (decoders see an empty, valid stream — not a rejection).
    * Nothing-to-trim passes through BYTE-IDENTICAL. Same rejection
    * contract as [[transcodeWav]].
    */
  def trimWavSilence(bytes: Array[Byte],
                     threshold: Int): Option[Array[Byte]] = {
    require(threshold >= 1 && threshold <= 32767)
    val meta = parseWav(0L, bytes)
    if (!meta.decode_ok || meta.bits_per_sample != 16) return None
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (2L * ch) != 0 ||
      meta.data_bytes > Int.MaxValue) return None
    val (_, dataOff, _) = wavChunkWalk(bytes)
    if (dataOff < 0) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = (meta.data_bytes / (2L * ch)).toInt
    def loud(f: Int): Boolean = {
      var c = 0
      while (c < ch) {
        if (math.abs(buf.getShort(dataOff + (f * ch + c) * 2).toInt)
          >= threshold) return true
        c += 1
      }
      false
    }
    var fi = 0
    while (fi < frames && !loud(fi)) fi += 1
    if (fi == frames) { // fully silent: empty but valid
      return Some(wavHeader(meta.sample_rate, ch, 16, 0).array())
    }
    var la = frames - 1
    while (la > fi && !loud(la)) la -= 1
    if (fi == 0 && la == frames - 1) return Some(bytes)
    val outFrames = la - fi + 1
    val bb = wavHeader(meta.sample_rate, ch, bitsPerSample = 16,
      dataLen = outFrames * ch * 2)
    var i = fi * ch
    while (i < (la + 1) * ch) {
      bb.putShort(buf.getShort(dataOff + i * 2))
      i += 1
    }
    Some(bb.array())
  }

  /** Partition-wise silence trim — [[transcodeWavBlobs]]'s contract
    * (empty content on rejection).
    */
  def trimWavSilenceBlobs(blobs: Dataset[MediaBlob],
                          threshold: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      trimWavSilence(b.content, threshold) match {
        case Some(out) => MediaBlob(b.media_id, b.media_type, out)
        case None => MediaBlob(b.media_id, b.media_type,
          Array.emptyByteArray)
      }
    })
  }

  /** Partition-wise peak normalization — [[transcodeWavBlobs]]'s
    * contract (empty content on rejection).
    */
  def normalizeWavPeakBlobs(blobs: Dataset[MediaBlob],
                            targetPeak: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      normalizeWavPeak(b.content, targetPeak) match {
        case Some(out) => MediaBlob(b.media_id, b.media_type, out)
        case None => MediaBlob(b.media_id, b.media_type,
          Array.emptyByteArray)
      }
    })
  }

  /** Partition-wise WAV blob transcode — [[resizeJpegBlobs]]'s
    * contract: one decoder per partition, blobs never shuffle;
    * untranscodable blobs come back with EMPTY content so the
    * downstream [[decodeWav]] / [[decodeWavStats]] routes them to
    * `decode_ok = false` (a row property, never a task failure).
    */
  def transcodeWavBlobs(blobs: Dataset[MediaBlob], targetRate: Int,
                        mono: Boolean,
                        fractional: Boolean = false): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      transcodeWav(b.content, targetRate, mono, fractional) match {
        case Some(out) => MediaBlob(b.media_id, b.media_type, out)
        case None => MediaBlob(b.media_id, b.media_type,
          Array.emptyByteArray)
      }
    })
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
    * block order, or None where [[decodePngPixels]] rejects.
    */
  private def lumaBlockSums(bytes: Array[Byte], gw: Int, gh: Int)
      : Option[(Array[Long], Array[Long])] =
    decodePngPixels(bytes).flatMap { case (w, h, px) =>
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

  case class ImageHashBit(media_id: Long, algo: String, bit_no: Int,
                          bit: Boolean)

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

  case class Y4mMeta(media_id: Long, width: Int, height: Int,
                     fps_num: Int, fps_den: Int, frames: Int,
                     frame_bytes: Long, duration_ms: Long,
                     decode_ok: Boolean)
  case class VideoFrame(media_id: Long, frame_no: Int,
                        frame_ts_ms: Long, frame: Array[Byte])

  private val BadY4m =
    Y4mMeta(0L, -1, -1, -1, -1, -1, -1L, -1L, decode_ok = false)

  /** Bytes per frame for a Y4M colorspace tag: 4:2:0 subsamples chroma
    * 2×2 (the overwhelmingly common case and the Y4M default), 4:2:2
    * halves it horizontally only, 4:4:4 keeps full chroma, mono has
    * none. Dimensions must be even for the subsampled layouts.
    */
  private def y4mFrameBytes(w: Int, h: Int, cs: String): Long = cs match {
    case c if c.startsWith("420") => w.toLong * h * 3 / 2
    case c if c.startsWith("422") => w.toLong * h * 2
    case c if c.startsWith("444") => w.toLong * h * 3
    case c if c.startsWith("mono") => w.toLong * h
    case _ => -1L
  }

  /** Minimal real Y4M (YUV4MPEG2) writer — the VIDEO leg of the codec
    * trio next to [[syntheticWav]] and [[syntheticPng]]. Y4M is the
    * uncompressed interchange container ffmpeg/x264 use for test
    * streams: one ASCII header line (`YUV4MPEG2 W.. H.. F..:.. Ip
    * A1:1 C420jpeg`), then per frame a `FRAME` marker line followed by
    * raw planar YUV bytes. Any video tool accepts the output;
    * generated without media libraries, deterministic per id (the
    * payload LCG folds the frame number so every frame differs).
    */
  def syntheticY4m(id: Long, width: Int, height: Int, fpsNum: Int,
                   fpsDen: Int, nFrames: Int): MediaBlob = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val frameLen = y4mFrameBytes(width, height, "420jpeg").toInt
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (marker.length + frameLen))
    bb.put(header)
    (0 until nFrames).foreach { f =>
      bb.put(marker)
      var x = (id * 31L + f) * 6364136223846793005L + 1442695040888963407L
      (0 until frameLen).foreach { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        bb.put((x >>> 56).toByte)
      }
    }
    MediaBlob(id, "video", bb.array())
  }

  /** Parsed Y4M stream structure: header fields + the byte offset and
    * length of every frame payload — shared by the metadata decode and
    * the frame extractor so the two can never disagree on layout.
    * Returns None on any malformation (wrong magic, missing/invalid
    * W/H/F, unknown colorspace, a truncated frame, trailing garbage):
    * like [[parseWav]]/[[parsePng]], corrupt blobs route to a failure
    * value instead of failing the task.
    */
  private def y4mLayout(bytes: Array[Byte])
      : Option[(Int, Int, Int, Int, String, Seq[(Long, Int)])] = {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 9) return None
    val header = new String(bytes, 0, nl, "US-ASCII")
    val toks = header.split(' ')
    if (toks.head != "YUV4MPEG2") return None
    var w = -1; var h = -1; var num = -1; var den = -1
    var cs = "420jpeg" // the Y4M default when no C tag is present
    toks.tail.foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = t.drop(1).toIntOption.getOrElse(-1)
        case 'F' => t.drop(1).split(':') match {
          case Array(a, b) =>
            num = a.toIntOption.getOrElse(-1)
            den = b.toIntOption.getOrElse(-1)
          case _ =>
        }
        case 'C' => cs = t.drop(1)
        case _ => // I (interlace), A (aspect), X (extension): metadata
      }
    }
    if (w <= 0 || h <= 0 || num <= 0 || den <= 0) return None
    val frameLen = y4mFrameBytes(w, h, cs)
    if (frameLen <= 0 || frameLen > Int.MaxValue) return None
    val frames = Seq.newBuilder[(Long, Int)]
    var off = nl + 1L
    while (off < bytes.length) {
      // each frame: "FRAME" + optional parameters up to '\n' + payload
      if (off + 5 > bytes.length ||
          new String(bytes, off.toInt, 5, "US-ASCII") != "FRAME")
        return None
      var e = off + 5
      while (e < bytes.length && bytes(e.toInt) != '\n'.toByte) e += 1
      if (e >= bytes.length) return None // marker line never closed
      val body = e + 1
      if (body + frameLen > bytes.length) return None // truncated frame
      frames += ((body, frameLen.toInt))
      off = body + frameLen
    }
    Some((w, h, num, den, cs, frames.result()))
  }

  /** REAL Y4M header+stream parse behind the decode seam. Validates
    * the whole stream (every frame fully present, clean EOF on a frame
    * boundary); `duration_ms` floors `frames·1000·den / num` in long
    * arithmetic, mirroring [[parseWav]]'s duration rule.
    */
  def parseY4m(id: Long, bytes: Array[Byte]): Y4mMeta =
    y4mLayout(bytes) match {
      case Some((w, h, num, den, cs, frames)) =>
        Y4mMeta(id, w, h, num, den, frames.length,
          y4mFrameBytes(w, h, cs),
          frames.length * 1000L * den / num, decode_ok = true)
      case None => BadY4m.copy(media_id = id)
    }

  /** Partition-wise Y4M decode — same plan shape as [[decodeWav]] /
    * [[decodePng]]: one decoder per partition, blobs never shuffle.
    */
  def decodeY4m(blobs: Dataset[MediaBlob]): Dataset[Y4mMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseY4m(b.media_id, b.content)))
  }

  /** REAL frame sampling: extract every `every`-th frame's raw YUV
    * payload from the container bytes — the byte-level counterpart of
    * the relational [[frameSample]] plan. Runs partition-wise; each
    * output row carries one frame, so downstream per-frame work
    * (feature extraction, resize) parallelizes past the per-video
    * grain without ever shuffling the source blobs. Corrupt streams
    * yield no frames (the decode seam reports them). Frame timestamps
    * come from the stream's own F tag.
    */
  def sampleFramesY4m(blobs: Dataset[MediaBlob],
                      every: Int): Dataset[VideoFrame] = {
    require(every >= 1)
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      y4mLayout(b.content) match {
        case Some((_, _, num, den, _, frames)) =>
          frames.iterator.zipWithIndex
            .filter(_._2 % every == 0)
            .map { case ((off, len), f) =>
              VideoFrame(b.media_id, f, f * 1000L * den / num,
                java.util.Arrays.copyOfRange(
                  b.content, off.toInt, off.toInt + len))
            }
        case None => Iterator.empty
      }
    })
  }

  /** One resized sampled video frame: raw planar YUV 4:2:0 payload at
    * the target dims (width·height·3/2 bytes).
    */
  case class ResizedFrame(media_id: Long, frame_no: Int, width: Int,
                          height: Int, frame: Array[Byte])

  /** Byte-level VIDEO frame resize — [[resizeJpeg]]'s role for the
    * Y4M leg: sample every `every`-th frame and nearest-neighbor-
    * resample its planar 4:2:0 payload to `maxEdge` (never upscale;
    * target dims are the exact integer rule with a FLOOR-TO-EVEN so
    * the chroma planes stay half-resolution integers: `w' =
    * max(2, even(w·maxEdge / max(w,h)))`). One partition-wise pass:
    * sampling and resizing happen in the same iterator, so full-size
    * frames never materialize beyond the one being processed and
    * blobs never shuffle. 420-family streams with even dims only
    * (what the writer and ffmpeg's default pipeline emit); other
    * colorspaces and corrupt streams yield no rows (the decode seam
    * reports them).
    */
  def resizeFramesY4m(blobs: Dataset[MediaBlob], every: Int,
                      maxEdge: Int): Dataset[ResizedFrame] = {
    require(every >= 1 && maxEdge >= 2)
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      y4mLayout(b.content) match {
        case Some((w, h, _, _, cs, frames)) if cs.startsWith("420") &&
            w % 2 == 0 && h % 2 == 0 =>
          val m = math.max(w, h)
          val (w2, h2) =
            if (m <= maxEdge) (w, h)
            else {
              def even(v: Long): Int = math.max(2L, v - (v % 2)).toInt
              (even(w.toLong * maxEdge / m), even(h.toLong * maxEdge / m))
            }
          frames.iterator.zipWithIndex
            .filter(_._2 % every == 0)
            .map { case ((off, _), f) =>
              ResizedFrame(b.media_id, f, w2, h2,
                resize420(b.content, off.toInt, w, h, w2, h2))
            }
        case _ => Iterator.empty
      }
    })
  }

  /** Nearest-neighbor resample of one planar 4:2:0 frame (Y then U
    * then V, each plane floor-mapped independently — chroma planes
    * are half-resolution on both axes, kept exactly half by the
    * even-dims contract).
    */
  private def resize420(src: Array[Byte], off: Int, w: Int, h: Int,
                        w2: Int, h2: Int): Array[Byte] = {
    val out = new Array[Byte](w2 * h2 * 3 / 2)
    if (w2 == w && h2 == h) {
      System.arraycopy(src, off, out, 0, out.length)
      return out
    }
    var p = 0
    var y = 0
    while (y < h2) {
      val rowBase = off + (y.toLong * h / h2).toInt * w
      var x = 0
      while (x < w2) {
        out(p) = src(rowBase + (x.toLong * w / w2).toInt)
        p += 1; x += 1
      }
      y += 1
    }
    val cw = w / 2; val ch = h / 2
    val cw2 = w2 / 2; val ch2 = h2 / 2
    var plane = 0
    while (plane < 2) {
      val base = off + w * h + plane * cw * ch
      var cy = 0
      while (cy < ch2) {
        val rowBase = base + (cy.toLong * ch / ch2).toInt * cw
        var cx = 0
        while (cx < cw2) {
          out(p) = src(rowBase + (cx.toLong * cw / cw2).toInt)
          p += 1; cx += 1
        }
        cy += 1
      }
      plane += 1
    }
    out
  }

  /** Container-level VIDEO transcode: [[resizeFramesY4m]]'s sampling
    * and per-plane resampling, re-emitted as a genuine Y4M STREAM
    * (header + FRAME-marked payloads) rather than per-frame rows — the
    * form a blob column keeps when the downstream consumer is another
    * codec pass, not per-frame feature extraction. The output header
    * carries the target dims, the input's F rate and C colorspace
    * (other stream parameters normalize to the writer's canonical
    * `Ip A1:1`; per-frame FRAME parameters are dropped). If no
    * transform applies (`every == 1` and dims already within
    * `maxEdge`) the input passes through BYTE-IDENTICAL. 420-family
    * even-dims streams only; anything else — or anything
    * [[parseY4m]] rejects — returns None (the blob variant routes
    * that to empty content).
    */
  def transcodeY4m(bytes: Array[Byte], every: Int,
                   maxEdge: Int): Option[Array[Byte]] = {
    require(every >= 1 && maxEdge >= 2)
    y4mLayout(bytes) match {
      case Some((w, h, num, den, cs, frames)) if cs.startsWith("420") &&
          w % 2 == 0 && h % 2 == 0 =>
        val m = math.max(w, h)
        val (w2, h2) =
          if (m <= maxEdge) (w, h)
          else {
            def even(v: Long): Int = math.max(2L, v - (v % 2)).toInt
            (even(w.toLong * maxEdge / m), even(h.toLong * maxEdge / m))
          }
        if (every == 1 && w2 == w && h2 == h) Some(bytes)
        else {
          val header =
            s"YUV4MPEG2 W$w2 H$h2 F$num:$den Ip A1:1 C$cs\n"
              .getBytes("US-ASCII")
          val marker = "FRAME\n".getBytes("US-ASCII")
          val kept = frames.zipWithIndex.filter(_._2 % every == 0)
          val frameLen = w2 * h2 * 3 / 2
          val bb = java.nio.ByteBuffer.allocate(
            header.length + kept.size * (marker.length + frameLen))
          bb.put(header)
          kept.foreach { case ((off, _), _) =>
            bb.put(marker)
            bb.put(resize420(bytes, off.toInt, w, h, w2, h2))
          }
          Some(bb.array())
        }
      case _ => None
    }
  }

  /** [[syntheticY4m]]'s structured sibling for temporal analysis: a
    * real Y4M container whose frames carry a SCENE structure instead
    * of LCG noise. Frame `f`'s luma plane is
    * `16 + ((id·37 + (f/sceneLen)·89) mod 200) + (f mod 2)` plus a
    * per-pixel `i mod 4` texture; chroma is flat 128. Within a scene
    * consecutive frame means differ by ±1 (the mod-2 flicker);
    * across a scene boundary the mod-200 walk jumps by 89 or −111 —
    * so mean-luma deltas separate cleanly and a threshold detector's
    * expected output is closed-form replayable.
    */
  def syntheticY4mScenes(id: Long, width: Int, height: Int,
                         nFrames: Int, sceneLen: Int): MediaBlob = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    require(sceneLen >= 1)
    val frameLen = y4mFrameBytes(width, height, "420jpeg").toInt
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val bb = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (marker.length + frameLen))
    bb.put(header)
    val ySize = width * height
    (0 until nFrames).foreach { f =>
      bb.put(marker)
      val base = (16 + ((id * 37 + (f / sceneLen) * 89) % 200) +
        (f % 2)).toInt
      var i = 0
      while (i < ySize) { bb.put((base + (i % 4)).toByte); i += 1 }
      while (i < frameLen) { bb.put(128.toByte); i += 1 }
    }
    MediaBlob(id, "video", bb.array())
  }

  /** One frame's temporal-analysis row: mean luma, the delta to the
    * previous frame (null on frame 0), the threshold cut flag, and
    * the running scene number (count of cuts so far).
    */
  case class SceneCut(media_id: Long, frame_no: Int, mean_luma: Double,
                      delta: Option[Double], is_cut: Boolean,
                      scene_no: Long)

  /** Shot/scene-boundary detection over Y4M blobs: per-frame mean
    * luma (the Y plane is the first w·h bytes of every Y4M
    * colorspace), deltas between consecutive frames, and a cut
    * wherever `|Δmean| > threshold` — the classic first-pass shot
    * detector video-curation pipelines run before frame sampling, so
    * sampled frames cover every shot instead of clustering inside
    * long ones. Plan shape matches the other blob kernels: ONE
    * partition-wise pass, frames of a stream visited sequentially in
    * their container (the delta needs no window shuffle — temporal
    * adjacency is physical adjacency in the bytes), blobs never
    * shuffle, corrupt streams yield no rows (the decode seam owns
    * reporting them).
    */
  def sceneCuts(blobs: Dataset[MediaBlob],
                threshold: Double): Dataset[SceneCut] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      y4mLayout(b.content) match {
        case Some((w, h, _, _, _, frames)) =>
          val ySize = w * h
          var prev = Double.NaN
          var scene = 0L
          frames.iterator.zipWithIndex.map { case ((off, _), f) =>
            var sum = 0L
            var i = off.toInt
            val end = off.toInt + ySize
            while (i < end) { sum += b.content(i) & 0xff; i += 1 }
            val mean = sum.toDouble / ySize
            val delta = if (f == 0) None else Some(mean - prev)
            val cut = delta.exists(d => math.abs(d) > threshold)
            if (cut) scene += 1
            prev = mean
            SceneCut(b.media_id, f, mean, delta, cut, scene)
          }
        case None => Iterator.empty
      }
    })
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

  // ------------------------------------------------------------ JPEG
  // The fourth real codec next to WAV/PNG/Y4M: S4's <img src> blobs
  // (extract_utils.py:50-59) are as often JPEG as PNG. Writer is a
  // genuine DC-only baseline JFIF encoder (real DCT math degenerates
  // to DC = 8·(v−128) for per-8×8-block-uniform pixels; unit quant
  // table makes that exact; canonical Huffman from the Annex-K
  // standard tables; FF byte stuffing) — any JPEG tool decodes the
  // output, MultimodalSpec proves it through JDK ImageIO. Parser is a
  // marker-stream walk mirroring parsePng's contract: header fields
  // out, every malformation to decode_ok=false, never a task failure.

  case class JpegMeta(media_id: Long, width: Int, height: Int,
                      components: Int, precision: Int,
                      entropy_bytes: Long, decode_ok: Boolean)

  private val BadJpeg =
    JpegMeta(0L, -1, -1, -1, -1, -1L, decode_ok = false)

  // Annex K.3.3.1 luminance DC table: category 0-11, canonical codes.
  private val JpegDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = (0 to 11).map(_.toByte).toArray
  // Annex K.3.3.2 luminance AC table (full standard table so the DHT
  // segment is the one every decoder ships; the DC-only writer uses
  // just its EOB code).
  private val JpegAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val JpegAcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical JPEG Huffman assignment (spec C.2): codes in value
    * order, incrementing, left-shifted at each length step.
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Byte])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    (1 to 16).foreach { len =>
      (0 until bits(len - 1)).foreach { _ =>
        out += (vals(k) & 0xff) -> (code, len)
        code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Encode per-8×8-block gray values as a REAL baseline JFIF JPEG:
    * SOI + JFIF APP0 + unit DQT + SOF0 (8-bit grayscale) + the two
    * Annex-K Huffman tables + SOS + DC-only entropy data + EOI. With
    * every block uniform and quant ≡ 1 the encoding is mathematically
    * lossless: any conforming decoder returns the block values
    * verbatim. `blockVals` is raster-ordered, ceil(w/8)·ceil(h/8)
    * entries.
    */
  def jpegEncode(width: Int, height: Int,
                 blockVals: Array[Int]): Array[Byte] = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(blockVals.length == bx * by,
      s"need ${bx * by} block values, got ${blockVals.length}")
    require(width > 0 && height > 0 && width < 65536 && height < 65536)
    val out = new java.io.ByteArrayOutputStream(256 + blockVals.length * 2)
    def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8)                                   // SOI
    marker(0xe0); u16(16)                          // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)                     // version 1.1
    out.write(0); u16(1); u16(1)                   // aspect-ratio 1:1
    out.write(0); out.write(0)                     // no thumbnail
    marker(0xdb); u16(67); out.write(0)            // DQT id 0, 8-bit
    (0 until 64).foreach(_ => out.write(1))        // unit quant: lossless DC
    marker(0xc0); u16(11)                          // SOF0 baseline
    out.write(8); u16(height); u16(width)
    out.write(1)                                   // 1 component (gray)
    out.write(1); out.write(0x11); out.write(0)    // id 1, 1×1, DQT 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, JpegDcBits, JpegDcVals)
    dht(1, JpegAcBits, JpegAcVals)
    marker(0xda); u16(8)                           // SOS
    out.write(1); out.write(1); out.write(0x00)    // comp 1, DC 0 / AC 0
    out.write(0); out.write(63); out.write(0)      // Ss / Se / Ah,Al
    // entropy-coded data: per block, Huffman(category(diff)) +
    // magnitude bits + EOB; FF bytes stuffed with 00
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val (eobCode, eobLen) = canonicalCodes(JpegAcBits, JpegAcVals)(0x00)
    var acc = 0L; var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nbits -= 8
      }
    }
    var prevDc = 0
    blockVals.foreach { v =>
      val dc = 8 * ((v & 0xff) - 128)              // exact DCT of a flat block
      var diff = dc - prevDc; prevDc = dc
      var cat = 0
      var mag = math.abs(diff)
      while (mag != 0) { cat += 1; mag >>= 1 }
      val (c, l) = dcCodes(cat)
      put(c, l)
      if (cat > 0) {
        if (diff < 0) diff += (1 << cat) - 1       // spec F.1.2.1 negative form
        put(diff, cat)
      }
      put(eobCode, eobLen)                         // all AC zero
    }
    if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits) // pad with 1s
    marker(0xd9)                                   // EOI
    out.toByteArray
  }

  /** Color (YCbCr 4:4:4) DC-only baseline JFIF — the shape real
    * `<img src>` blobs actually take. Three components, no chroma
    * subsampling (1×1 sampling everywhere), every component
    * referencing quant table 0 and Huffman tables 0 (legal per spec,
    * and it keeps the writer to the tables [[jpegEncode]] already
    * carries); each component holds its own DC predictor across the
    * interleaved MCU stream. Per-block-uniform planes + unit quant =
    * mathematically lossless in YCbCr space (RGB output then differs
    * from the closed form only by the decoder's YCbCr→RGB rounding).
    */
  def jpegEncodeColor(width: Int, height: Int, yB: Array[Int],
                      cbB: Array[Int], crB: Array[Int]): Array[Byte] = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    require(yB.length == bx * by && cbB.length == bx * by &&
      crB.length == bx * by, s"need ${bx * by} blocks per component")
    require(width > 0 && height > 0 && width < 65536 && height < 65536)
    val out = new java.io.ByteArrayOutputStream(512 + yB.length * 6)
    def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8)
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)
    out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    marker(0xdb); u16(67); out.write(0)
    (0 until 64).foreach(_ => out.write(1))
    marker(0xc0); u16(8 + 3 * 3)
    out.write(8); u16(height); u16(width)
    out.write(3)
    (1 to 3).foreach { cid =>
      out.write(cid); out.write(0x11); out.write(0) // 1×1, quant 0
    }
    def dht(cls: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, JpegDcBits, JpegDcVals)
    dht(1, JpegAcBits, JpegAcVals)
    marker(0xda); u16(6 + 2 * 3)
    out.write(3)
    (1 to 3).foreach { cid => out.write(cid); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val (eobCode, eobLen) = canonicalCodes(JpegAcBits, JpegAcVals)(0x00)
    var acc = 0L; var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nbits -= 8
      }
    }
    val planes = Array(yB, cbB, crB)
    val prevDc = new Array[Int](3)
    var b = 0
    while (b < yB.length) {                       // interleaved MCUs
      var c = 0
      while (c < 3) {
        val dc = 8 * ((planes(c)(b) & 0xff) - 128)
        var diff = dc - prevDc(c); prevDc(c) = dc
        var cat = 0
        var mag = math.abs(diff)
        while (mag != 0) { cat += 1; mag >>= 1 }
        val (cc, l) = dcCodes(cat)
        put(cc, l)
        if (cat > 0) {
          if (diff < 0) diff += (1 << cat) - 1
          put(diff, cat)
        }
        put(eobCode, eobLen)
        c += 1
      }
      b += 1
    }
    if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    marker(0xd9)
    out.toByteArray
  }

  /** Deterministic id-seeded COLOR JPEG blob. */
  def syntheticJpegColor(id: Long, width: Int, height: Int): MediaBlob = {
    val n = ((width + 7) / 8) * ((height + 7) / 8)
    val planes = Array.fill(3)(new Array[Int](n))
    var x = id * 6364136223846793005L + 1442695040888963407L
    (0 until 3).foreach { c =>
      (0 until n).foreach { i =>
        x = x * 6364136223846793005L + 1442695040888963407L
        planes(c)(i) = ((x >>> 56) & 0xff).toInt
      }
    }
    MediaBlob(id, "image",
      jpegEncodeColor(width, height, planes(0), planes(1), planes(2)))
  }

  /** Deterministic id-seeded grayscale JPEG blob: per-block values
    * from the same LCG family as [[syntheticPng]].
    */
  def syntheticJpeg(id: Long, width: Int, height: Int): MediaBlob = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val vals = new Array[Int](bx * by)
    var x = id * 6364136223846793005L + 1442695040888963407L
    (0 until vals.length).foreach { i =>
      x = x * 6364136223846793005L + 1442695040888963407L
      vals(i) = ((x >>> 56) & 0xff).toInt
    }
    MediaBlob(id, "image", jpegEncode(width, height, vals))
  }

  /** REAL JPEG header parse — [[parsePng]]'s contract for JFIF
    * streams. Requires SOI first; walks the marker segments (length-
    * checked against EOF); pulls (precision, height, width,
    * components) from the first SOF; after SOS counts entropy bytes
    * (FF00 stuffing and RST markers stay inside the scan) across ALL
    * scans until EOI — progressive (SOF2) streams are multi-scan
    * chains of tables+SOS segments and validate end to end.
    * decode_ok reflects what [[decodeJpegPixels]] can decode: a
    * complete single-scan baseline (SOF0) or a complete progressive
    * (SOF2) chain, 8-bit, components ∈ {1,3,4}. The other frame
    * types (arithmetic, lossless, hierarchical, 12-bit) stay
    * decode_ok=false, like palette PNGs in decodePngPixels.
    * Truncation anywhere — a segment length past EOF, a scan chain
    * that never reaches EOI — routes to decode_ok=false.
    */
  def parseJpeg(id: Long, bytes: Array[Byte]): JpegMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8)
      return BadJpeg.copy(media_id = id)
    var off = 2
    var w = -1; var h = -1; var ncomp = -1; var prec = -1
    var baseline = false
    var progressive = false
    var sawSof = false
    var inScanAt = -1
    while (inScanAt < 0 && off + 4 <= bytes.length) {
      if (u8(off) != 0xff) return BadJpeg.copy(media_id = id)
      // spec B.1.1.2: any number of 0xFF fill bytes may pad before a
      // marker code — skip them instead of misreading the next pair
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        off += 2                                   // standalone marker
      } else if (m == 0xd9) {
        return BadJpeg.copy(media_id = id)         // EOI before any scan
      } else {
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > bytes.length)
          return BadJpeg.copy(media_id = id)       // truncated segment
        val isSof = (m >= 0xc0 && m <= 0xcf) &&
          m != 0xc4 && m != 0xc8 && m != 0xcc     // not DHT/JPG/DAC
        if (isSof && !sawSof) {
          sawSof = true
          baseline = m == 0xc0
          progressive = m == 0xc2
          if (len < 8) return BadJpeg.copy(media_id = id)
          prec = u8(off + 4)
          h = u16(off + 5); w = u16(off + 7)
          ncomp = u8(off + 9)
          if (len != 8 + 3 * ncomp)
            return BadJpeg.copy(media_id = id)
        }
        if (m == 0xda) inScanAt = off + 2 + len    // SOS: entropy follows
        else off += 2 + len
      }
    }
    if (inScanAt < 0 || !sawSof) return BadJpeg.copy(media_id = id)
    // entropy-coded scans: stuffed FF00 and RSTn stay inside; a
    // tables/SOS segment between scans continues the chain (the
    // progressive shape); EOI completes it
    var p = inScanAt
    var entropy = 0L
    var complete = false
    var ended = false
    var multiScan = false
    while (!ended && p < bytes.length) {
      if (u8(p) == 0xff && p + 1 < bytes.length) {
        val m = u8(p + 1)
        if (m == 0x00) { entropy += 2; p += 2 }            // stuffed FF
        else if (m >= 0xd0 && m <= 0xd7) { entropy += 2; p += 2 } // RST
        else if (m == 0xff) p += 1                         // fill byte
        else if (m == 0xd9) { complete = true; ended = true } // EOI
        else if (m == 0xd8 ||
          (m >= 0xc0 && m <= 0xcf && m != 0xc4)) {
          ended = true // a SECOND frame inside the stream (DHT
                       // redefinition between scans is fine, SOF/SOI
                       // is not): structurally broken
        } else {
          // a tables/DRI/SOS segment between scans: walk it so
          // multi-scan (progressive) chains validate to EOI
          if (p + 4 > bytes.length) ended = true
          else {
            val l2 = u16(p + 2)
            if (l2 < 2 || p + 2 + l2 > bytes.length) ended = true
            else { multiScan = true; p += 2 + l2 }
          }
        }
      } else { entropy += 1; p += 1 }
    }
    if (w <= 0 || h <= 0) return BadJpeg.copy(media_id = id)
    val ok = complete && prec == 8 &&
      (ncomp == 1 || ncomp == 3 || ncomp == 4) &&
      ((baseline && !multiScan) || progressive)
    JpegMeta(id, w, h, ncomp, prec, entropy, decode_ok = ok)
  }

  /** Partition-wise JPEG decode — same plan shape as [[decodePng]]. */
  def decodeJpeg(blobs: Dataset[MediaBlob]): Dataset[JpegMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseJpeg(b.media_id, b.content)))
  }

  /** FULL pixel decode of a DC-only grayscale baseline JPEG — the
    * inverse of [[jpegEncode]], [[decodePngPixels]]'s role for this
    * codec: walks the segments for the quant table, frame header and
    * Huffman tables, then entropy-decodes the scan (canonical Huffman
    * walk, magnitude-bit sign extension per spec F.2.2.1, FF00
    * de-stuffing), dequantizes each block's DC and emits the flat
    * block value `128 + round(DC·Q[0]/8)`. Returns
    * (width, height, per-block values raster-ordered) or None for
    * anything [[parseJpeg]] rejects plus shapes this decoder doesn't
    * cover (multi-component, non-zero AC in the stream). A block with
    * AC energy decodes its DC exactly but the flat-value model would
    * lie, so EOB-less blocks route to None rather than a wrong image.
    */
  def decodeJpegBlocks(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodeJpegMcus(bytes).collect {
      case (w, h, planes) if planes.length == 1 => (w, h, planes(0))
    }

  /** Multi-component generalization of [[decodeJpegBlocks]]: decodes
    * the interleaved MCU stream of a DC-only baseline JPEG with 1×1
    * sampling everywhere (grayscale or YCbCr 4:4:4), each component
    * entropy-decoded with the DC table its SOS entry references and
    * dequantized with the quant table its SOF entry references, its
    * own DC predictor carried across MCUs. The per-component AC table
    * is parsed too and the end-of-block symbol is decoded through IT —
    * not assumed to be the standard table's 4-bit `1010` code — so a
    * foreign stream with a custom AC table either decodes correctly
    * or routes to None (absent AC table, or a first AC symbol that
    * isn't EOB). Returns (width, height, one flat-block-value array
    * per component) or None for anything [[parseJpeg]] rejects plus
    * subsampled / AC-bearing / non-standard shapes ([[decodeJpegPixels]]
    * is the full AC-capable decoder; THIS entry point is the exact
    * lossless inverse of [[jpegEncode]]/[[jpegEncodeColor]]).
    */
  def decodeJpegMcus(bytes: Array[Byte])
      : Option[(Int, Int, Array[Array[Int]])] = {
    val meta = parseJpeg(0L, bytes)
    if (!meta.decode_ok) return None
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    // second walk: collect DQT / DHT tables BY ID (a segment may pack
    // several tables back to back — the common layout in foreign
    // encoders), the SOF component's quant-table ref, and the SOS
    // component's DC/AC-table refs + scan offset
    var off = 2
    val quants = mutable.Map.empty[Int, Array[Int]]
    val dcTables = mutable.Map.empty[Int, JpegHuff]
    val acTables = mutable.Map.empty[Int, JpegHuff]
    var sofTq: Array[Int] = null       // per-component quant refs
    var sofSampling: Array[Int] = null
    var sosTd: Array[Int] = null       // per-component DC-table refs
    var sosTa: Array[Int] = null       // per-component AC-table refs
    var scanAt = -1
    while (scanAt < 0 && off + 4 <= bytes.length) {
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1 // fill bytes
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else {
        val len = u16(off + 2)
        val segEnd = off + 2 + len
        if (m == 0xdb) {                       // DQT: walk packed tables
          var p0 = off + 4
          while (p0 + 1 <= segEnd) {
            val pq = u8(p0) >> 4               // 0 = 8-bit, 1 = 16-bit
            val size = 1 + (if (pq == 1) 128 else 64)
            if (p0 + size > segEnd) { p0 = segEnd }
            else {
              if (pq == 0)                     // 16-bit entries are
                quants(u8(p0) & 0x0f) =        // skipped, not misparsed
                  Array.tabulate(64)(i => u8(p0 + 1 + i))
              p0 += size
            }
          }
        }
        if (m == 0xc4) {                       // DHT: walk packed tables
          var p0 = off + 4
          while (p0 + 17 <= segEnd) {
            val cls = u8(p0) >> 4
            val id = u8(p0) & 0x0f
            val bits = Array.tabulate(16)(i => u8(p0 + 1 + i))
            val total = bits.sum
            if (p0 + 17 + total > segEnd) { p0 = segEnd }
            else {
              val vals = Array.tabulate(total)(i => u8(p0 + 17 + i))
              if (cls == 0) dcTables(id) = buildJpegHuff(bits, vals)
              else if (cls == 1) acTables(id) = buildJpegHuff(bits, vals)
              p0 += 17 + total
            }
          }
        }
        if (m == 0xc0 && sofTq == null) {      // FIRST SOF only — the
          // one parseJpeg validated; a decoy second frame header must
          // not redirect table selection (the DHT-shadowing class)
          sofTq = Array.tabulate(meta.components)(i => u8(off + 12 + 3 * i))
          sofSampling =
            Array.tabulate(meta.components)(i => u8(off + 11 + 3 * i))
        }
        if (m == 0xda) {
          if (u8(off + 4) != meta.components)
            return None                        // Ns must cover all comps
          sosTd =
            Array.tabulate(meta.components)(i => u8(off + 6 + 2 * i) >> 4)
          sosTa =
            Array.tabulate(meta.components)(i => u8(off + 6 + 2 * i) & 0x0f)
          scanAt = segEnd
        } else off += 2 + len
      }
    }
    if (sofTq == null || sosTd == null || scanAt < 0) return None
    if (!sofSampling.forall(_ == 0x11)) return None  // 1×1 only
    val compQuant = sofTq.map(id => quants.get(id).orNull)
    val compDc = sosTd.map(id => dcTables.get(id).orNull)
    val compAc = sosTa.map(id => acTables.get(id).orNull)
    if (compQuant.exists(_ == null) || compDc.exists(_ == null) ||
      compAc.exists(_ == null)) return None
    val bx = (meta.width + 7) / 8
    val by = (meta.height + 7) / 8
    val nc = meta.components
    val out = Array.fill(nc)(new Array[Int](bx * by))
    val br = new JpegBitReader(bytes, scanAt)
    val prevDc = new Array[Int](nc)
    var b = 0
    while (b < bx * by) {                       // interleaved MCUs
      var c = 0
      while (c < nc) {
        val cat = br.huffDecode(compDc(c))
        if (cat < 0 || cat > 15) return None
        var diff = 0
        if (cat > 0) {
          if (!br.fill(cat)) return None
          diff = jpegExtend(br.take(cat), cat)
        }
        val dc = prevDc(c) + diff; prevDc(c) = dc
        // AC: the first AC symbol must be EOB, decoded through the
        // component's OWN table (a custom table may assign EOB any
        // code) — AC energy would make the flat-value model lie
        if (br.huffDecode(compAc(c)) != 0x00) return None
        out(c)(b) = 128 + Math.round(dc * compQuant(c)(0) / 8.0).toInt
        c += 1
      }
      b += 1
    }
    Some((meta.width, meta.height, out))
  }

  // ------------------------------------------------------------------
  // Shared baseline-JPEG machinery (spec ITU-T T.81): zigzag order,
  // canonical Huffman decode tables (F.2.2.3), the de-stuffing bit
  // reader, DCT basis (StrictMath so results are bit-identical across
  // JVMs — decode output feeds hash-compared query results).
  // ------------------------------------------------------------------

  /** Zigzag position k → natural (row-major v*8+u) index. */
  private val JpegZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman decode table per spec F.2.2.3: min/max code and
    * value pointer per code length.
    */
  private final class JpegHuff(val minCode: Array[Int],
                               val maxCode: Array[Int],
                               val valPtr: Array[Int],
                               val vals: Array[Int]) extends Serializable

  private def buildJpegHuff(bits: Array[Int], vals: Array[Int]): JpegHuff = {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k
        minCode(l) = code
        maxCode(l) = code + bits(l - 1) - 1
        code += bits(l - 1)
        k += bits(l - 1)
      }
      code <<= 1
      l += 1
    }
    new JpegHuff(minCode, maxCode, valPtr, vals)
  }

  /** Entropy-stream bit reader: FF00 de-stuffing, any real marker =
    * stream end (restart markers are consumed explicitly via
    * [[JpegBitReader.restart]], which byte-aligns first — spec F.2.1.3.1).
    */
  private final class JpegBitReader(bytes: Array[Byte], var p: Int) {
    private var acc = 0L
    private var nbits = 0
    private def u8(i: Int): Int = bytes(i) & 0xff
    def fill(need: Int): Boolean = {
      while (nbits < need && p < bytes.length) {
        if (u8(p) == 0xff) {
          if (p + 1 < bytes.length && u8(p + 1) == 0x00) {
            acc = (acc << 8) | 0xff; nbits += 8; p += 2
          } else return false                 // real marker: stream end
        } else { acc = (acc << 8) | u8(p); nbits += 8; p += 1 }
      }
      nbits >= need
    }
    def take(n: Int): Int = {
      val v = ((acc >>> (nbits - n)) & ((1L << n) - 1)).toInt
      nbits -= n; v
    }
    /** Decode one Huffman symbol bit by bit (codes are ≤ 16 bits);
      * -1 on truncation or a code outside the table.
      */
    def huffDecode(t: JpegHuff): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        if (!fill(1)) return -1
        code = (code << 1) | take(1)
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.vals(t.valPtr(l) + code - t.minCode(l))
        l += 1
      }
      -1
    }
    /** Byte-align, skip fill FFs, consume the expected RSTn marker. */
    def restart(idx: Int): Boolean = {
      acc = 0L; nbits = 0
      while (p + 1 < bytes.length && u8(p) == 0xff && u8(p + 1) == 0xff)
        p += 1
      if (p + 1 < bytes.length && u8(p) == 0xff &&
        u8(p + 1) == (0xd0 | (idx & 7))) { p += 2; true }
      else false
    }
  }

  /** Spec F.2.2.1 sign extension of an s-bit magnitude. */
  private def jpegExtend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** DCT basis with normalization folded in:
    * `JpegCosine(x*8+u) = Cu·cos((2x+1)uπ/16)`, Cu = 1/√2 for u=0.
    * StrictMath: decode output feeds hash-compared query results, so
    * the basis must be bit-identical on every executor JVM.
    */
  private val JpegCosine: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0) *
          (if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** 8×8 inverse DCT (spec A.3.3) of natural-order dequantized
    * coefficients into clamped [0,255] pixels (+128 level shift).
    * `tmp` is caller-provided scratch (64 doubles) so the MCU loop
    * allocates nothing per block.
    */
  private def idct8x8(coef: Array[Int], tmp: Array[Double],
                      out: Array[Int]): Unit = {
    var v = 0
    while (v < 8) {                     // rows: sum over u per (v, x)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * JpegCosine(x * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {                     // cols: sum over v per (x, y)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var w = 0
        while (w < 8) { s += tmp(w * 8 + x) * JpegCosine(y * 8 + w); w += 1 }
        val px = Math.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** 8×8 forward DCT (spec A.3.3) of level-shifted pixels into
    * natural-order coefficients. `tmp` is caller scratch.
    */
  private def fdct8x8(px: Array[Int], tmp: Array[Double],
                      out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {                     // rows: sum over x per (y, u)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (px(y * 8 + x) - 128) * JpegCosine(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {                     // cols: sum over y per (u, v)
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y2 = 0
        while (y2 < 8) { s += tmp(y2 * 8 + u) * JpegCosine(y2 * 8 + v); y2 += 1 }
        out(v * 8 + u) = s / 4.0
        u += 1
      }
      v += 1
    }
  }

  /** Annex K.1 luminance quantization table (natural row-major order). */
  private val JpegQuantLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.2 chrominance quantization table (natural row-major order). */
  private val JpegQuantChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** FULL pixel decode of a baseline sequential JPEG — AC-capable:
    * Huffman AC decode (run/size symbols, ZRL, EOB per spec F.2.2.2),
    * dequantization, 8×8 inverse DCT, and chroma upsampling for
    * subsampled streams (4:2:0 / 4:2:2 / any h,v ∈ 1..4 — box
    * replication, the nearest-neighbor inverse of the encoder's
    * downsample), restart-marker intervals honored (DRI + RSTn with
    * predictor reset). Covers what real web JPEGs carry
    * (reference extract_utils.py:50-59 harvests exactly these);
    * progressive (SOF2) streams route to the multi-scan
    * spectral-selection / successive-approximation decoder
    * ([[decodeJpegPixelsProgressive]]); arithmetic / 12-bit /
    * multi-scan-sequential streams route to None via [[parseJpeg]]'s
    * decode_ok, truncation and malformed entropy data route to None
    * mid-decode — a row property, never a task failure.
    *
    * Returns (width, height, one FULL-RESOLUTION pixel plane per
    * component — grayscale 1, YCbCr 3, CMYK-shaped 4); [[decodeJpegRgb]]
    * layers the JFIF color transform on top. MultimodalSpec round-trips
    * JDK ImageIO-encoded photos (AC-bearing, 4:2:0) through this
    * decoder to within quantization tolerance.
    */
  def decodeJpegPixels(bytes: Array[Byte])
      : Option[(Int, Int, Array[Array[Int]])] = {
    val meta = parseJpeg(0L, bytes)
    if (!meta.decode_ok) return None
    if (jpegFrameMarker(bytes) == 0xc2)
      return decodeJpegPixelsProgressive(bytes, meta)
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var off = 2
    val quants = mutable.Map.empty[Int, Array[Int]]
    val dcTables = mutable.Map.empty[Int, JpegHuff]
    val acTables = mutable.Map.empty[Int, JpegHuff]
    var sofIds: Array[Int] = null
    var sofH: Array[Int] = null
    var sofV: Array[Int] = null
    var sofTq: Array[Int] = null
    var sosTd: Array[Int] = null
    var sosTa: Array[Int] = null
    var dri = 0
    var scanAt = -1
    val nc = meta.components
    while (scanAt < 0 && off + 4 <= bytes.length) {
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else {
        val len = u16(off + 2)
        val segEnd = off + 2 + len
        if (m == 0xdb) {
          var p0 = off + 4
          while (p0 + 1 <= segEnd) {
            val pq = u8(p0) >> 4
            val size = 1 + (if (pq == 1) 128 else 64)
            if (p0 + size > segEnd) { p0 = segEnd }
            else {
              if (pq == 0)
                quants(u8(p0) & 0x0f) =
                  Array.tabulate(64)(i => u8(p0 + 1 + i))
              else                             // 16-bit precision table
                quants(u8(p0) & 0x0f) =
                  Array.tabulate(64)(i => u16(p0 + 1 + 2 * i))
              p0 += size
            }
          }
        }
        if (m == 0xc4) {
          var p0 = off + 4
          while (p0 + 17 <= segEnd) {
            val cls = u8(p0) >> 4
            val id = u8(p0) & 0x0f
            val bits = Array.tabulate(16)(i => u8(p0 + 1 + i))
            val total = bits.sum
            if (p0 + 17 + total > segEnd) { p0 = segEnd }
            else {
              val vals = Array.tabulate(total)(i => u8(p0 + 17 + i))
              if (cls == 0) dcTables(id) = buildJpegHuff(bits, vals)
              else if (cls == 1) acTables(id) = buildJpegHuff(bits, vals)
              p0 += 17 + total
            }
          }
        }
        if (m == 0xdd && len >= 4) dri = u16(off + 4)
        if (m == 0xc0 && sofTq == null) {
          sofIds = Array.tabulate(nc)(i => u8(off + 10 + 3 * i))
          sofH = Array.tabulate(nc)(i => u8(off + 11 + 3 * i) >> 4)
          sofV = Array.tabulate(nc)(i => u8(off + 11 + 3 * i) & 0x0f)
          sofTq = Array.tabulate(nc)(i => u8(off + 12 + 3 * i))
        }
        if (m == 0xda) {
          if (u8(off + 4) != nc) return None   // single interleaved scan
          if (sofIds == null) return None
          // scan components may list ids in any order: map to SOF index
          sosTd = new Array[Int](nc)
          sosTa = new Array[Int](nc)
          var i = 0
          while (i < nc) {
            val cid = u8(off + 5 + 2 * i)
            val ci = sofIds.indexOf(cid)
            if (ci < 0) return None
            sosTd(ci) = u8(off + 6 + 2 * i) >> 4
            sosTa(ci) = u8(off + 6 + 2 * i) & 0x0f
            i += 1
          }
          // baseline demands full spectral selection, no successive
          // approximation (Ss=0, Se=63, Ah=Al=0) — a stream carrying
          // progressive scan params under an SOF0 header is
          // non-conforming and would decode to garbage, not pixels
          if (u8(off + 5 + 2 * nc) != 0 || u8(off + 6 + 2 * nc) != 63 ||
            u8(off + 7 + 2 * nc) != 0) return None
          scanAt = segEnd
        } else off += 2 + len
      }
    }
    if (sofTq == null || sosTd == null || scanAt < 0) return None
    if (sofH.exists(h => h < 1 || h > 4) || sofV.exists(v => v < 1 || v > 4))
      return None
    if (nc == 1) {                      // non-interleaved single-comp
      sofH(0) = 1; sofV(0) = 1         // scan: sampling is irrelevant,
    }                                   // the block grid is the image's
    val compQuant = sofTq.map(id => quants.get(id).orNull)
    val compDc = sosTd.map(id => dcTables.get(id).orNull)
    val compAc = sosTa.map(id => acTables.get(id).orNull)
    if (compQuant.exists(_ == null) || compDc.exists(_ == null) ||
      compAc.exists(_ == null)) return None
    val hMax = sofH.max
    val vMax = sofV.max
    val mcusX = (meta.width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (meta.height + 8 * vMax - 1) / (8 * vMax)
    val planeW = Array.tabulate(nc)(c => mcusX * sofH(c) * 8)
    val planeH = Array.tabulate(nc)(c => mcusY * sofV(c) * 8)
    val planes = Array.tabulate(nc)(c => new Array[Int](planeW(c) * planeH(c)))
    val br = new JpegBitReader(bytes, scanAt)
    val prevDc = new Array[Int](nc)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          if (!br.restart(rstIdx)) return None
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
        var c = 0
        while (c < nc) {
          var bj = 0
          while (bj < sofV(c)) {
            var bi = 0
            while (bi < sofH(c)) {
              java.util.Arrays.fill(coef, 0)
              val cat = br.huffDecode(compDc(c))
              if (cat < 0 || cat > 15) return None
              var diff = 0
              if (cat > 0) {
                if (!br.fill(cat)) return None
                diff = jpegExtend(br.take(cat), cat)
              }
              val dc = prevDc(c) + diff
              prevDc(c) = dc
              coef(0) = dc * compQuant(c)(0)
              var k = 1
              var eob = false
              while (!eob && k < 64) {          // spec F.2.2.2 AC decode
                val rs = br.huffDecode(compAc(c))
                if (rs < 0) return None
                val run = rs >> 4
                val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16        // ZRL: 16 zeros
                  else eob = true               // EOB
                } else {
                  k += run
                  if (k > 63) return None
                  if (!br.fill(size)) return None
                  coef(JpegZigZag(k)) =
                    jpegExtend(br.take(size), size) * compQuant(c)(k)
                  k += 1
                }
              }
              idct8x8(coef, tmp, blk)
              val px0 = (mx * sofH(c) + bi) * 8
              val py0 = (my * sofV(c) + bj) * 8
              var yy = 0
              while (yy < 8) {
                val rowBase = (py0 + yy) * planeW(c) + px0
                var xx = 0
                while (xx < 8) { planes(c)(rowBase + xx) = blk(yy * 8 + xx); xx += 1 }
                yy += 1
              }
              bi += 1
            }
            bj += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // crop to image dims + box-replication chroma upsample
    val outPlanes = Array.tabulate(nc) { c =>
      val o = new Array[Int](meta.width * meta.height)
      val hs = sofH(c)
      val vs = sofV(c)
      var y = 0
      while (y < meta.height) {
        val sy = y * vs / vMax
        val srcBase = sy * planeW(c)
        val dstBase = y * meta.width
        var x = 0
        while (x < meta.width) {
          o(dstBase + x) = planes(c)(srcBase + x * hs / hMax)
          x += 1
        }
        y += 1
      }
      o
    }
    Some((meta.width, meta.height, outPlanes))
  }

  /** EXIF metadata row: `orientation` is TIFF tag 0x0112 (1..8; -1 if
    * the tag is absent), `big_endian` the TIFF byte order, `has_exif`
    * whether a well-formed Exif APP1 was found at all. Orientation
    * matters for training data: ~1 in 7 real camera JPEGs stores
    * rotated pixels and relies on this tag for display — a pipeline
    * that ignores it trains on sideways images.
    */
  case class JpegExif(media_id: Long, orientation: Int,
                      big_endian: Boolean, has_exif: Boolean)

  /** Exif APP1 walk, metadata only: find the `Exif\0\0` APP1 segment
    * before the first scan, validate the TIFF header (II/MM + 42),
    * walk IFD0's 12-byte entries for the orientation SHORT. Both byte
    * orders honored. Any structural violation — truncated TIFF, bad
    * endian marker, an IFD running past the segment — reports
    * has_exif=false, a row property.
    */
  def parseJpegExif(id: Long, bytes: Array[Byte]): JpegExif = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16be(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val none = JpegExif(id, -1, big_endian = false, has_exif = false)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return none
    var off = 2
    while (off + 4 <= bytes.length) {
      if (u8(off) != 0xff) return none
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else if (m == 0xda || m == 0xd9) return none // scan: no EXIF seen
      else {
        val len = u16be(off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return none
        if (m == 0xe1 && len >= 16 && u8(off + 4) == 'E' &&
          u8(off + 5) == 'x' && u8(off + 6) == 'i' &&
          u8(off + 7) == 'f' && u8(off + 8) == 0 && u8(off + 9) == 0) {
          val t0 = off + 10 // TIFF origin
          val tEnd = off + 2 + len
          if (t0 + 8 > tEnd) return none
          val big = u8(t0) == 'M' && u8(t0 + 1) == 'M'
          if (!big && !(u8(t0) == 'I' && u8(t0 + 1) == 'I')) return none
          def v16(i: Int): Int =
            if (big) (u8(i) << 8) | u8(i + 1) else u8(i) | (u8(i + 1) << 8)
          def v32(i: Int): Long =
            if (big) (v16(i).toLong << 16) | v16(i + 2)
            else (v16(i + 2).toLong << 16) | v16(i)
          if (v16(t0 + 2) != 42) return none
          val ifd = v32(t0 + 4)
          if (ifd < 8 || t0 + ifd + 2 > tEnd) return none
          val i0 = (t0 + ifd).toInt
          val cnt = v16(i0)
          var orient = -1
          var e = 0
          while (e < cnt) {
            val ep = i0 + 2 + e * 12
            if (ep + 12 > tEnd) return none
            if (v16(ep) == 0x0112 && v16(ep + 2) == 3 &&
              v32(ep + 4) == 1L) orient = v16(ep + 8)
            e += 1
          }
          return JpegExif(id, orient, big, has_exif = true)
        }
        off += 2 + len
      }
    }
    none
  }

  /** Partition-wise EXIF decode — the [[decodeJpeg]] contract. */
  def decodeJpegExif(blobs: Dataset[MediaBlob]): Dataset[JpegExif] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseJpegExif(b.media_id, b.content)))
  }

  /** Apply an EXIF orientation (1..8) to a decoded RGB plane — the
    * eight transforms of TIFF tag 0x0112 (identity, mirrors, 180,
    * transpose/transverse, 90/270 rotations; 5-8 swap the dims). A
    * pure pixel permutation: fidelity bounds against the upright
    * original are unchanged, which is exactly what q165 pins.
    */
  def orientRgb(width: Int, height: Int, rgb: Array[Byte],
                orientation: Int): (Int, Int, Array[Byte]) = {
    if (orientation <= 1 || orientation > 8) return (width, height, rgb)
    val swap = orientation >= 5
    val (w2, h2) = if (swap) (height, width) else (width, height)
    val out = new Array[Byte](rgb.length)
    var y2 = 0
    while (y2 < h2) {
      var x2 = 0
      while (x2 < w2) {
        var sx = 0; var sy = 0
        orientation match {
          case 2 => sx = width - 1 - x2; sy = y2
          case 3 => sx = width - 1 - x2; sy = height - 1 - y2
          case 4 => sx = x2; sy = height - 1 - y2
          case 5 => sx = y2; sy = x2
          case 6 => sx = y2; sy = height - 1 - x2  // 90 deg CW
          case 7 => sx = width - 1 - y2; sy = height - 1 - x2
          case _ => sx = width - 1 - y2; sy = x2   // 8: 270 deg CW
        }
        val s = (sy * width + sx) * 3
        val d = (y2 * w2 + x2) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x2 += 1
      }
      y2 += 1
    }
    (w2, h2, out)
  }

  /** [[decodeJpegRgb]] + EXIF auto-rotation: the pixels a training
    * pipeline should actually ingest (a camera JPEG with orientation
    * 6 stores its pixels sideways and relies on the tag). Streams
    * without EXIF, or with orientation 1, decode unchanged.
    */
  def decodeJpegRgbOriented(bytes: Array[Byte])
      : Option[(Int, Int, Array[Byte])] =
    decodeJpegRgb(bytes).map { case (w, h, rgb) =>
      val ex = parseJpegExif(0L, bytes)
      if (ex.has_exif && ex.orientation >= 2 && ex.orientation <= 8)
        orientRgb(w, h, rgb, ex.orientation)
      else (w, h, rgb)
    }

  /** Insert a genuine Exif APP1 (single-entry IFD0 carrying the
    * orientation SHORT, either byte order) right after SOI. Fixture
    * writer for [[parseJpegExif]]; any EXIF reader accepts the output.
    */
  def withExifOrientation(jpeg: Array[Byte], orientation: Int,
                          bigEndian: Boolean): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    require(orientation >= 1 && orientation <= 8)
    val tiff = java.nio.ByteBuffer.allocate(26)
      .order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put((if (bigEndian) "MM" else "II").getBytes("US-ASCII"))
    tiff.putShort(42).putInt(8)
    tiff.putShort(1) // one IFD0 entry
    tiff.putShort(0x0112.toShort).putShort(3).putInt(1)
    tiff.putShort(orientation.toShort).putShort(0) // left-justified
    tiff.putInt(0)   // no next IFD
    val app1len = 2 + 6 + 26
    val out = java.nio.ByteBuffer.allocate(jpeg.length + 2 + app1len)
    out.put(jpeg, 0, 2)
    out.put(0xff.toByte).put(0xe1.toByte).putShort(app1len.toShort)
    out.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    out.put(tiff.array())
    out.put(jpeg, 2, jpeg.length - 2)
    out.array()
  }

  /** First SOF marker byte (0xc0 baseline, 0xc2 progressive, ...) or
    * -1 — the frame-type router for [[decodeJpegPixels]].
    */
  private def jpegFrameMarker(bytes: Array[Byte]): Int = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    var off = 2
    while (off + 4 <= bytes.length) {
      if (u8(off) != 0xff) return -1
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 &&
        m != 0xcc) return m
      else if (m == 0xda || m == 0xd9) return -1
      else off += 2 + u16(off + 2)
    }
    -1
  }

  /** FULL pixel decode of a PROGRESSIVE (SOF2) JPEG — spec Annex G:
    * the image's DCT coefficients arrive over MULTIPLE scans, each
    * carrying a spectral band (Ss..Se) at a bit precision (Ah, Al):
    * DC-first scans Huffman-decode predictors (value << Al), DC
    * refinements append one bit per block, AC-first scans decode a
    * band with EOB-RUN block skips (G.1.2.2), and AC refinements run
    * the correction-bit algorithm (G.1.2.3: every nonzero-history
    * coefficient crossed consumes a bit; zero-history positions count
    * the run and receive ±(1<<Al)). Coefficients accumulate per
    * component across scans; dequantization + IDCT + chroma upsample
    * run ONCE at EOI — the same tail as the baseline decoder.
    * Restart intervals reset predictors AND the EOB run. ~10% of real
    * web JPEGs behind the reference's img-src path
    * (extract_utils.py:50-59) are progressive.
    *
    * Structural violations (a second SOF, an AC scan listing multiple
    * components, a band past 63, truncation mid-scan) return None —
    * the row-property contract. Interleaved scans are DC-only per
    * spec; non-interleaved scans walk the component's own ceil-grid
    * while storage uses the padded MCU grid stride, so both
    * addressing modes hit the same blocks.
    */
  private def decodeJpegPixelsProgressive(bytes: Array[Byte],
                                          meta: JpegMeta)
      : Option[(Int, Int, Array[Array[Int]])] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val nc = meta.components
    val quants = mutable.Map.empty[Int, Array[Int]]
    val dcTables = mutable.Map.empty[Int, JpegHuff]
    val acTables = mutable.Map.empty[Int, JpegHuff]
    var sofIds: Array[Int] = null
    var sofH: Array[Int] = null
    var sofV: Array[Int] = null
    var sofTq: Array[Int] = null
    var dri = 0
    var hMax = 0; var vMax = 0
    var mcusX = 0; var mcusY = 0
    var bw: Array[Int] = null  // padded (MCU-grid) block width/height
    var bh: Array[Int] = null
    var bwN: Array[Int] = null // non-interleaved ceil-grid dims
    var bhN: Array[Int] = null
    var coefs: Array[Array[Int]] = null

    // one scan's entropy decode; returns false on corruption
    def runScan(ns: Int, scanComp: Array[Int], scanTd: Array[Int],
                scanTa: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
                br: JpegBitReader): Boolean = {
      val prevDc = new Array[Int](nc)
      var eobrun = 0
      var rstIdx = 0
      val dcT = Array.tabulate(ns)(i => dcTables.get(scanTd(i)).orNull)
      val acT = Array.tabulate(ns)(i => acTables.get(scanTa(i)).orNull)
      if (ss == 0 && ah == 0 && dcT.exists(_ == null)) return false
      if (ss > 0 && acT(0) == null) return false

      def dcFirst(c: Int, base: Int, t: JpegHuff): Boolean = {
        val cat = br.huffDecode(t)
        if (cat < 0 || cat > 15) return false
        var diff = 0
        if (cat > 0) {
          if (!br.fill(cat)) return false
          diff = jpegExtend(br.take(cat), cat)
        }
        prevDc(c) += diff
        coefs(c)(base) = prevDc(c) << al
        true
      }
      def dcRefine(c: Int, base: Int): Boolean = {
        if (!br.fill(1)) return false
        if (br.take(1) == 1) coefs(c)(base) |= (1 << al)
        true
      }
      def acFirst(c: Int, base: Int, t: JpegHuff): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        var k = ss
        while (k <= se) {
          val rs = br.huffDecode(t)
          if (rs < 0) return false
          val r = rs >> 4
          val s = rs & 15
          if (s == 0) {
            if (r == 15) k += 16 // ZRL
            else {
              eobrun = (1 << r) - 1
              if (r > 0) {
                if (!br.fill(r)) return false
                eobrun += br.take(r)
              }
              return true // EOB ends this block; run covers the NEXT
            }
          } else {
            k += r
            if (k > se) return false
            if (!br.fill(s)) return false
            coefs(c)(base + JpegZigZag(k)) =
              jpegExtend(br.take(s), s) << al
            k += 1
          }
        }
        true
      }
      def acRefine(c: Int, base: Int, t: JpegHuff): Boolean = {
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(z: Int): Boolean = {
          if (!br.fill(1)) return false
          if (br.take(1) == 1 && (coefs(c)(z) & p1) == 0)
            coefs(c)(z) += (if (coefs(c)(z) >= 0) p1 else m1)
          true
        }
        var k = ss
        if (eobrun == 0) {
          var entered = false // entered the EOB tail
          while (k <= se && !entered) {
            val rs = br.huffDecode(t)
            if (rs < 0) return false
            var r = rs >> 4
            val s = rs & 15
            var value = 0
            if (s == 0) {
              if (r != 15) {
                eobrun = 1 << r
                if (r > 0) {
                  if (!br.fill(r)) return false
                  eobrun += br.take(r)
                }
                entered = true
              }
              // r == 15: ZRL — skip 16 zero-history positions below
            } else {
              if (s != 1) return false
              if (!br.fill(1)) return false
              value = if (br.take(1) == 1) p1 else m1
            }
            if (!entered) {
              var placed = false
              while (k <= se && !placed) {
                val z = base + JpegZigZag(k)
                if (coefs(c)(z) != 0) {
                  if (!correct(z)) return false
                  k += 1
                } else if (r == 0) {
                  if (value != 0) coefs(c)(z) = value
                  k += 1
                  placed = true
                } else { r -= 1; k += 1 }
              }
              // value != 0 with no zero slot left: corrupt but
              // recoverable — the while exits on k > se either way
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val z = base + JpegZigZag(k)
            if (coefs(c)(z) != 0 && !correct(z)) return false
            k += 1
          }
          eobrun -= 1
        }
        true
      }
      def oneBlock(si: Int, c: Int, base: Int): Boolean =
        if (ss == 0) {
          if (ah == 0) dcFirst(c, base, dcT(si)) else dcRefine(c, base)
        } else {
          if (ah == 0) acFirst(c, base, acT(si))
          else acRefine(c, base, acT(si))
        }
      def atRestart(unit: Int): Boolean = {
        if (dri > 0 && unit > 0 && unit % dri == 0) {
          if (!br.restart(rstIdx)) return false
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
          eobrun = 0
        }
        true
      }

      if (ns > 1) { // interleaved: MCU order (DC scans only)
        var mcu = 0
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (!atRestart(mcu)) return false
            var si = 0
            while (si < ns) {
              val c = scanComp(si)
              var bj = 0
              while (bj < sofV(c)) {
                var bi = 0
                while (bi < sofH(c)) {
                  val base = ((my * sofV(c) + bj) * bw(c) +
                    mx * sofH(c) + bi) * 64
                  if (!oneBlock(si, c, base)) return false
                  bi += 1
                }
                bj += 1
              }
              si += 1
            }
            mcu += 1
            mx += 1
          }
          my += 1
        }
      } else { // non-interleaved: the component's own ceil-grid
        val c = scanComp(0)
        var blk = 0
        var by = 0
        while (by < bhN(c)) {
          var bx = 0
          while (bx < bwN(c)) {
            if (!atRestart(blk)) return false
            if (!oneBlock(0, c, (by * bw(c) + bx) * 64)) return false
            blk += 1
            bx += 1
          }
          by += 1
        }
      }
      true
    }

    var off = 2
    var done = false
    while (!done && off + 2 <= bytes.length) {
      if (u8(off) != 0xff) return None
      while (off + 3 < bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else if (m == 0xd9) done = true
      else {
        if (off + 4 > bytes.length) return None
        val len = u16(off + 2)
        val segEnd = off + 2 + len
        if (len < 2 || segEnd > bytes.length) return None
        var next = segEnd
        if (m == 0xdb) {
          var p0 = off + 4
          while (p0 + 1 <= segEnd) {
            val pq = u8(p0) >> 4
            val size = 1 + (if (pq == 1) 128 else 64)
            if (p0 + size > segEnd) p0 = segEnd
            else {
              if (pq == 0)
                quants(u8(p0) & 0x0f) =
                  Array.tabulate(64)(i => u8(p0 + 1 + i))
              else
                quants(u8(p0) & 0x0f) =
                  Array.tabulate(64)(i => u16(p0 + 1 + 2 * i))
              p0 += size
            }
          }
        } else if (m == 0xc4) {
          var p0 = off + 4
          while (p0 + 17 <= segEnd) {
            val cls = u8(p0) >> 4
            val id = u8(p0) & 0x0f
            val bits = Array.tabulate(16)(i => u8(p0 + 1 + i))
            val total = bits.sum
            if (p0 + 17 + total > segEnd) p0 = segEnd
            else {
              val vals = Array.tabulate(total)(i => u8(p0 + 17 + i))
              if (cls == 0) dcTables(id) = buildJpegHuff(bits, vals)
              else if (cls == 1) acTables(id) = buildJpegHuff(bits, vals)
              p0 += 17 + total
            }
          }
        } else if (m == 0xdd) {
          if (len >= 4) dri = u16(off + 4)
        } else if (m == 0xc2) {
          if (sofTq != null) return None // second frame
          sofIds = Array.tabulate(nc)(i => u8(off + 10 + 3 * i))
          sofH = Array.tabulate(nc)(i => u8(off + 11 + 3 * i) >> 4)
          sofV = Array.tabulate(nc)(i => u8(off + 11 + 3 * i) & 0x0f)
          sofTq = Array.tabulate(nc)(i => u8(off + 12 + 3 * i))
          if (nc == 1) { sofH(0) = 1; sofV(0) = 1 }
          if (sofH.exists(x => x < 1 || x > 4) ||
            sofV.exists(x => x < 1 || x > 4)) return None
          hMax = sofH.max; vMax = sofV.max
          mcusX = (meta.width + 8 * hMax - 1) / (8 * hMax)
          mcusY = (meta.height + 8 * vMax - 1) / (8 * vMax)
          bw = Array.tabulate(nc)(c => mcusX * sofH(c))
          bh = Array.tabulate(nc)(c => mcusY * sofV(c))
          bwN = Array.tabulate(nc)(c =>
            ((meta.width * sofH(c) + hMax - 1) / hMax + 7) / 8)
          bhN = Array.tabulate(nc)(c =>
            ((meta.height * sofV(c) + vMax - 1) / vMax + 7) / 8)
          coefs = Array.tabulate(nc)(c =>
            new Array[Int](bw(c) * bh(c) * 64))
        } else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4) {
          return None // a non-SOF2 frame reached this decoder
        } else if (m == 0xda) {
          if (sofTq == null) return None
          val ns = u8(off + 4)
          if (ns < 1 || ns > nc || len != 6 + 2 * ns) return None
          val scanComp = new Array[Int](ns)
          val scanTd = new Array[Int](ns)
          val scanTa = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val ci = sofIds.indexOf(u8(off + 5 + 2 * i))
            if (ci < 0) return None
            scanComp(i) = ci
            scanTd(i) = u8(off + 6 + 2 * i) >> 4
            scanTa(i) = u8(off + 6 + 2 * i) & 0x0f
            i += 1
          }
          val ss = u8(off + 5 + 2 * ns)
          val se = u8(off + 6 + 2 * ns)
          val ah = u8(off + 7 + 2 * ns) >> 4
          val al = u8(off + 7 + 2 * ns) & 0x0f
          if (ss == 0) { if (se != 0) return None }
          else if (ns != 1 || se < ss || se > 63) return None
          if (al > 13 || ah > 13) return None
          val br = new JpegBitReader(bytes, segEnd)
          if (!runScan(ns, scanComp, scanTd, scanTa, ss, se, ah, al,
            br)) return None
          next = br.p
        }
        off = next
      }
    }
    if (!done || coefs == null) return None
    val compQuant = sofTq.map(tq => quants.get(tq).orNull)
    if (compQuant.exists(_ == null)) return None
    // dequant + IDCT once, then the baseline tail: crop + upsample
    val planeW = Array.tabulate(nc)(c => bw(c) * 8)
    val planes = Array.tabulate(nc)(c =>
      new Array[Int](bw(c) * 8 * bh(c) * 8))
    val coefBuf = new Array[Int](64)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    var c = 0
    while (c < nc) {
      var by = 0
      while (by < bh(c)) {
        var bx = 0
        while (bx < bw(c)) {
          val base = (by * bw(c) + bx) * 64
          var k = 0
          while (k < 64) {
            val z = JpegZigZag(k)
            coefBuf(z) = coefs(c)(base + z) * compQuant(c)(k)
            k += 1
          }
          idct8x8(coefBuf, tmp, blk)
          var yy = 0
          while (yy < 8) {
            val rowBase = (by * 8 + yy) * planeW(c) + bx * 8
            var xx = 0
            while (xx < 8) {
              planes(c)(rowBase + xx) = blk(yy * 8 + xx); xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      c += 1
    }
    val outPlanes = Array.tabulate(nc) { cc =>
      val o = new Array[Int](meta.width * meta.height)
      val hs = sofH(cc)
      val vs = sofV(cc)
      var y = 0
      while (y < meta.height) {
        val srcBase = (y * vs / vMax) * planeW(cc)
        val dstBase = y * meta.width
        var x = 0
        while (x < meta.width) {
          o(dstBase + x) = planes(cc)(srcBase + x * hs / hMax)
          x += 1
        }
        y += 1
      }
      o
    }
    Some((meta.width, meta.height, outPlanes))
  }

  /** [[decodeJpegPixels]] + the JFIF color transform: grayscale
    * replicates, YCbCr converts (CCIR 601 full-range, the JFIF
    * convention), 4-component (Adobe CMYK-shaped) streams return None
    * (pixels are decodable via [[decodeJpegPixels]], but there is no
    * ICC-free RGB contract for them). Output layout matches
    * [[decodePngPixels]]: 3 bytes/pixel RGB, row-major.
    */
  def decodeJpegRgb(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeJpegPixels(bytes).flatMap { case (w, h, planes) =>
      val n = w * h
      def clamp(v: Int): Byte =
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
      planes.length match {
        case 1 =>
          val rgb = new Array[Byte](n * 3)
          var i = 0
          while (i < n) {
            val g = planes(0)(i).toByte
            rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
            i += 1
          }
          Some((w, h, rgb))
        case 3 =>
          val rgb = new Array[Byte](n * 3)
          var i = 0
          while (i < n) {
            val y = planes(0)(i)
            val cb = planes(1)(i) - 128
            val cr = planes(2)(i) - 128
            rgb(i * 3) = clamp(Math.round(y + 1.402 * cr).toInt)
            rgb(i * 3 + 1) =
              clamp(Math.round(y - 0.344136 * cb - 0.714136 * cr).toInt)
            rgb(i * 3 + 2) = clamp(Math.round(y + 1.772 * cb).toInt)
            i += 1
          }
          Some((w, h, rgb))
        case _ => None
      }
    }

  /** Encode arbitrary PIXELS as a real baseline JPEG — the AC-capable
    * generalization of [[jpegEncode]]'s flat-block writer: per 8×8
    * block (edge-replicated padding), forward DCT, Annex-K
    * quantization, and full run/size AC Huffman coding (ZRL + EOB)
    * with the Annex-K tables. One component (grayscale), quant table
    * 0 = Annex K luminance. `gray` is row-major w·h values 0-255.
    */
  def jpegEncodeGrayPixels(width: Int, height: Int, gray: Array[Int],
                           restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == width * height,
      s"need ${width * height} pixels, got ${gray.length}")
    jpegEncodePlanes(width, height, Array(gray),
      Array(JpegQuantLum), Array(0), restartInterval)
  }

  /** Color pixel encode: RGB → YCbCr (JFIF CCIR 601 full-range),
    * 4:4:4 (no subsampling — [[decodeJpegPixels]] handles foreign
    * subsampled input; our writer keeps every plane full-resolution),
    * Y on the Annex-K luminance quant table (id 0), chroma on the
    * chrominance table (id 1). `rgb` is [[decodePngPixels]]-layout:
    * 3 bytes/pixel row-major.
    */
  def jpegEncodeRgbPixels(width: Int, height: Int, rgb: Array[Byte],
                          restartInterval: Int = 0): Array[Byte] = {
    val (y, cb, cr) = rgbToYcbcr(width, height, rgb)
    jpegEncodeYcbcrPixels(width, height, y, cb, cr, restartInterval)
  }

  /** JFIF CCIR 601 full-range RGB → YCbCr planes. */
  private def rgbToYcbcr(width: Int, height: Int, rgb: Array[Byte])
      : (Array[Int], Array[Int], Array[Int]) = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} bytes, got ${rgb.length}")
    val n = width * height
    val y = new Array[Int](n)
    val cb = new Array[Int](n)
    val cr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = rgb(i * 3) & 0xff
      val g = rgb(i * 3 + 1) & 0xff
      val b = rgb(i * 3 + 2) & 0xff
      def cl(v: Long): Int =
        (if (v < 0) 0 else if (v > 255) 255 else v).toInt
      y(i) = cl(Math.round(0.299 * r + 0.587 * g + 0.114 * b))
      cb(i) = cl(Math.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128))
      cr(i) = cl(Math.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128))
      i += 1
    }
    (y, cb, cr)
  }

  /** 4:2:0 subsampled color encode — the layout real web encoders
    * default to (half-resolution chroma = half the chroma data of
    * 4:4:4, invisible on photographic content): Y at full resolution
    * with 2×2 sampling, Cb/Cr box-mean-downsampled to
    * ceil(w/2)×ceil(h/2) at 1×1. [[decodeJpegPixels]] reverses it
    * with box-replication upsampling; spec pins the round-trip and
    * ImageIO agreement, and that the stream is smaller than the
    * 4:4:4 encoding of the same pixels.
    */
  def jpegEncodeRgb420(width: Int, height: Int, rgb: Array[Byte],
                       restartInterval: Int = 0): Array[Byte] = {
    val (y, cb, cr) = rgbToYcbcr(width, height, rgb)
    jpegEncodeYcbcr420(width, height, y, cb, cr, restartInterval)
  }

  /** [[jpegEncodeRgb420]] over full-resolution YCbCr planes (chroma
    * downsampled here) — lets [[resizeJpeg]] preserve a subsampled
    * input's layout without an RGB detour.
    */
  def jpegEncodeYcbcr420(width: Int, height: Int, y: Array[Int],
                         cb: Array[Int], cr: Array[Int],
                         restartInterval: Int = 0): Array[Byte] = {
    val cw = (width + 1) / 2
    val ch = (height + 1) / 2
    def down(p: Array[Int]): Array[Int] = {
      val o = new Array[Int](cw * ch)
      var yy = 0
      while (yy < ch) {
        var xx = 0
        while (xx < cw) {
          var sum = 0
          var cnt = 0
          var dy = 0
          while (dy < 2) {
            val sy = yy * 2 + dy
            var dx = 0
            while (dx < 2) {
              val sx = xx * 2 + dx
              if (sx < width && sy < height) {
                sum += p(sy * width + sx); cnt += 1
              }
              dx += 1
            }
            dy += 1
          }
          o(yy * cw + xx) = (sum + cnt / 2) / cnt
          xx += 1
        }
        yy += 1
      }
      o
    }
    require(y.length == width * height && cb.length == y.length &&
      cr.length == y.length, s"need ${width * height} pixels per plane")
    jpegEncodePlanesSampled(width, height, Array(y, down(cb), down(cr)),
      Array((width, height), (cw, ch), (cw, ch)),
      Array((2, 2), (1, 1), (1, 1)),
      Array(JpegQuantLum, JpegQuantChrom), Array(0, 1, 1),
      restartInterval)
  }

  /** YCbCr-plane pixel encode (4:4:4). Exposed separately so
    * [[resizeJpeg]] can resample decoded planes without an RGB
    * detour's extra rounding.
    */
  def jpegEncodeYcbcrPixels(width: Int, height: Int, y: Array[Int],
                            cb: Array[Int], cr: Array[Int],
                            restartInterval: Int = 0): Array[Byte] = {
    require(y.length == width * height && cb.length == y.length &&
      cr.length == y.length, s"need ${width * height} pixels per plane")
    jpegEncodePlanes(width, height, Array(y, cb, cr),
      Array(JpegQuantLum, JpegQuantChrom), Array(0, 1, 1),
      restartInterval)
  }

  /** Shared pixel-plane baseline writer: headers (SOI/APP0/DQTs/SOF0/
    * DHT/SOS), then interleaved 1×1-sampled MCUs — fdct → quantize →
    * DC-diff + run/size AC Huffman per block. All components share the
    * Annex-K luminance Huffman pair (legal: tables and components are
    * independently numbered); quantization varies per component via
    * `tqOf` into `quantTables`. `restartInterval` > 0 writes a DRI
    * segment and emits RSTn markers (byte-aligned, predictors reset)
    * every that-many MCUs — spec F.2.1.3.1, the resync machinery real
    * encoders use on large images; [[decodeJpegPixels]] consumes it.
    * All components 1×1 (4:4:4 / grayscale); the sampled writer
    * below generalizes.
    */
  private def jpegEncodePlanes(width: Int, height: Int,
                               planes: Array[Array[Int]],
                               quantTables: Array[Array[Int]],
                               tqOf: Array[Int],
                               restartInterval: Int = 0): Array[Byte] =
    jpegEncodePlanesSampled(width, height, planes,
      Array.fill(planes.length)((width, height)),
      Array.fill(planes.length)((1, 1)), quantTables, tqOf,
      restartInterval)

  /** Fully general interleaved baseline writer: per-component
    * sampling factors (hc, vc) and plane dimensions — 4:2:0 passes
    * Y at (2,2)/full-res and chroma at (1,1)/half-res, exactly the
    * layout every real web encoder emits. MCUs are hMax·8 × vMax·8
    * pixel tiles; each component contributes hc×vc blocks per MCU
    * from its own (possibly downsampled) plane, edge-replicated at
    * the borders.
    */
  private def jpegEncodePlanesSampled(width: Int, height: Int,
                                      planes: Array[Array[Int]],
                                      planeDims: Array[(Int, Int)],
                                      sampling: Array[(Int, Int)],
                                      quantTables: Array[Array[Int]],
                                      tqOf: Array[Int],
                                      restartInterval: Int = 0)
      : Array[Byte] = {
    require(width > 0 && height > 0 && width < 65536 && height < 65536)
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream(1024 + width * height)
    def u16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8)
    marker(0xe0); u16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)
    out.write(0); u16(1); u16(1); out.write(0); out.write(0)
    quantTables.zipWithIndex.foreach { case (q, id) =>  // DQT in zigzag
      marker(0xdb); u16(67); out.write(id)
      var k = 0
      while (k < 64) { out.write(q(JpegZigZag(k))); k += 1 }
    }
    marker(0xc0); u16(8 + 3 * nc)
    out.write(8); u16(height); u16(width)
    out.write(nc)
    var ci = 0
    while (ci < nc) {
      out.write(ci + 1)
      out.write((sampling(ci)._1 << 4) | sampling(ci)._2)
      out.write(tqOf(ci))
      ci += 1
    }
    def dht(cls: Int, bits: Array[Int], vals: Array[Byte]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write)
      out.write(vals, 0, vals.length)
    }
    dht(0, JpegDcBits, JpegDcVals)
    dht(1, JpegAcBits, JpegAcVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2 * nc)
    out.write(nc)
    ci = 0
    while (ci < nc) { out.write(ci + 1); out.write(0x00); ci += 1 }
    out.write(0); out.write(63); out.write(0)
    val dcCodes = canonicalCodes(JpegDcBits, JpegDcVals)
    val acCodes = canonicalCodes(JpegAcBits, JpegAcVals)
    var acc = 0L
    var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >>> (nbits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nbits -= 8
      }
    }
    def putMag(v: Int): Int = {          // category; writes code+bits
      var cat = 0
      var mag = Math.abs(v)
      while (mag != 0) { cat += 1; mag >>= 1 }
      cat
    }
    val hMax = sampling.map(_._1).max
    val vMax = sampling.map(_._2).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val px = new Array[Int](64)
    val tmp = new Array[Double](64)
    val fcoef = new Array[Double](64)
    val zq = new Array[Int](64)
    val prevDc = new Array[Int](nc)
    var rstIdx = 0
    var myi = 0
    while (myi < mcusY) {
      var mxi = 0
      while (mxi < mcusX) {
        val mcuIdx = myi * mcusX + mxi
        if (restartInterval > 0 && mcuIdx > 0 &&
          mcuIdx % restartInterval == 0) {
          if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
          marker(0xd0 | rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(prevDc, 0)
        }
        var c = 0
        while (c < nc) {
          val plane = planes(c)
          val (cw, ch) = planeDims(c)
          val (hc, vc) = sampling(c)
          val q = quantTables(tqOf(c))
          var bj = 0
          while (bj < vc) {
           var bi = 0
           while (bi < hc) {
          val px0 = (mxi * hc + bi) * 8
          val py0 = (myi * vc + bj) * 8
          var yy = 0
          while (yy < 8) {                 // edge-replicated 8×8 fetch
            val sy = math.min(ch - 1, py0 + yy)
            var xx = 0
            while (xx < 8) {
              val sx = math.min(cw - 1, px0 + xx)
              px(yy * 8 + xx) = plane(sy * cw + sx) & 0xff
              xx += 1
            }
            yy += 1
          }
          fdct8x8(px, tmp, fcoef)
          var k = 0
          while (k < 64) {                 // quantize into zigzag order
            zq(k) = Math.round(fcoef(JpegZigZag(k)) / q(JpegZigZag(k))).toInt
            k += 1
          }
          var diff = zq(0) - prevDc(c)
          prevDc(c) = zq(0)
          val dcCat = putMag(diff)
          val (dcCode, dcLen) = dcCodes(dcCat)
          put(dcCode, dcLen)
          if (dcCat > 0) {
            if (diff < 0) diff += (1 << dcCat) - 1
            put(diff, dcCat)
          }
          var run = 0
          k = 1
          while (k < 64) {
            val v = zq(k)
            if (v == 0) run += 1
            else {
              while (run > 15) {
                val (z, zl) = acCodes(0xf0)  // ZRL
                put(z, zl); run -= 16
              }
              val cat = putMag(v)
              val (ac, al) = acCodes((run << 4) | cat)
              put(ac, al)
              var bitsV = v
              if (v < 0) bitsV += (1 << cat) - 1
              put(bitsV, cat)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (e, el) = acCodes(0x00); put(e, el) }  // EOB
           bi += 1
           }
           bj += 1
          }
          c += 1
        }
        mxi += 1
      }
      myi += 1
    }
    if (nbits > 0) put((1 << (8 - nbits)) - 1, 8 - nbits)
    marker(0xd9)
    out.toByteArray
  }

  /** Deterministic id-seeded PHOTO-LIKE color JPEG: smooth gradients
    * plus a low-frequency sine so the encoded stream carries REAL AC
    * coefficients (unlike [[syntheticJpegColor]]'s flat blocks) —
    * the fixture for the AC decode path. StrictMath keeps the pixels
    * bit-identical across executors.
    */
  def syntheticJpegPhoto(id: Long, width: Int, height: Int): MediaBlob =
    MediaBlob(id, "image",
      jpegEncodeRgbPixels(width, height, syntheticPhotoRgb(id, width, height)))

  /** The raw pixels behind [[syntheticJpegPhoto]], exposed so fidelity
    * checks can replay the generator and measure decode error against
    * ground truth.
    */
  def syntheticPhotoRgb(id: Long, width: Int, height: Int): Array[Byte] = {
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        rgb(i) = (x * 255 / math.max(1, width - 1)).toByte
        rgb(i + 1) = (y * 255 / math.max(1, height - 1)).toByte
        rgb(i + 2) = (128 + 90 * StrictMath.sin(
          (x + y) / 11.0 + (id % 17) / 3.0)).toInt.toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** First SOF0 component's sampling byte ((h<<4)|v), or -1 — how
    * [[resizeJpeg]] learns whether its input was chroma-subsampled so
    * the re-encode can preserve the layout class.
    */
  private def jpegLumaSampling(bytes: Array[Byte]): Int = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return -1
    var off = 2
    while (off + 4 <= bytes.length) {
      while (off + 4 <= bytes.length && u8(off + 1) == 0xff) off += 1
      val m = u8(off + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) off += 2
      else {
        val len = u16(off + 2)
        if (len < 2 || off + 2 + len > bytes.length) return -1
        if (m == 0xc0) return if (len >= 9) u8(off + 11) else -1
        if (m == 0xda) return -1
        off += 2 + len
      }
    }
    -1
  }

  /** Byte-level JPEG resize — [[resizePng]]'s contract for this codec:
    * full AC-capable pixel decode ([[decodeJpegPixels]]), never
    * upscale (within-budget images return their ORIGINAL bytes
    * untouched), exact integer target dims (`w' = max(1,
    * w·maxEdge/max(w,h))` in longs), nearest-neighbor floor-mapping
    * resample of each YCbCr/gray plane (no RGB detour — resampling
    * commutes with the color transform under nearest-neighbor), then
    * re-encode through the Annex-K pixel writer, PRESERVING the
    * input's layout class (grayscale stays 1-component; a 4:2:0
    * input re-encodes 4:2:0; everything else 4:4:4). Undecodable
    * streams (progressive, truncated, CMYK-shaped) return None.
    */
  def resizeJpeg(bytes: Array[Byte], maxEdge: Int)
      : Option[(Int, Int, Array[Byte])] = {
    require(maxEdge >= 1)
    decodeJpegPixels(bytes).flatMap { case (w, h, planes) =>
      if (planes.length != 1 && planes.length != 3) None
      else {
        val m = math.max(w, h)
        if (m <= maxEdge) Some((w, h, bytes))
        else {
          val w2 = math.max(1L, w.toLong * maxEdge / m).toInt
          val h2 = math.max(1L, h.toLong * maxEdge / m).toInt
          val sampled = planes.map { p =>
            val o = new Array[Int](w2 * h2)
            var y = 0
            while (y < h2) {
              val sy = (y.toLong * h / h2).toInt
              var x = 0
              while (x < w2) {
                o(y * w2 + x) = p(sy * w + (x.toLong * w / w2).toInt)
                x += 1
              }
              y += 1
            }
            o
          }
          val enc =
            if (sampled.length == 1) jpegEncodeGrayPixels(w2, h2, sampled(0))
            else if (jpegLumaSampling(bytes) == 0x22)
              // a 4:2:0 input re-encodes 4:2:0 — a resize must not
              // silently double the chroma data of a subsampled crawl
              jpegEncodeYcbcr420(w2, h2, sampled(0), sampled(1),
                sampled(2))
            else jpegEncodeYcbcrPixels(w2, h2, sampled(0), sampled(1),
              sampled(2))
          Some((w2, h2, enc))
        }
      }
    }
  }

  /** Partition-wise JPEG blob resize — [[resizePngBlobs]]'s contract:
    * one decoder per partition, blobs never shuffle; undecodable blobs
    * come back with EMPTY content so the downstream [[decodeJpeg]]
    * routes them to `decode_ok = false` (a row property, never a task
    * failure).
    */
  def resizeJpegBlobs(blobs: Dataset[MediaBlob],
                      maxEdge: Int): Dataset[MediaBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      resizeJpeg(b.content, maxEdge) match {
        case Some((_, _, outBytes)) =>
          MediaBlob(b.media_id, b.media_type, outBytes)
        case None => MediaBlob(b.media_id, b.media_type,
          Array.emptyByteArray)
      }
    })
  }
  // ------------------------------------------------------------------
  // WebP + GIF: metadata-only image legs. A real crawl image column is
  // heavily WebP (RIFF....WEBP) and GIF; both parse dims from fixed
  // headers with no entropy decode — the parseJpeg pattern: bounds as
  // Long, truncation or a bad signature is a row property, never a
  // task failure.
  // ------------------------------------------------------------------

  /** `variant` is the first recognized VP8-family chunk: "VP8" (lossy
    * — dims from the sync-coded frame header), "VP8L" (lossless — the
    * 14-bit packed dims), or "VP8X" (extended — 24-bit canvas dims).
    */
  case class WebpMeta(media_id: Long, variant: String, width: Int,
                      height: Int, decode_ok: Boolean)

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

  /** `version` is "87a" or "89a"; `gct` mirrors the global-color-table
    * flag bit (real GIFs nearly always set it — the sniffed value is a
    * triage signal, not a decode input).
    */
  case class GifMeta(media_id: Long, version: String, width: Int,
                     height: Int, gct: Boolean, decode_ok: Boolean)

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

  // ------------------------------------------------------------------
  // GZIP: the compressed-text leg. Crawl text arrives gzip-framed
  // (CommonCrawl WET/WARC payloads, .json.gz dumps); a 100 TB text
  // pipeline decompresses blob columns partition-locally before any
  // text operator runs. java.util.zip is in every JVM — no new deps.
  // ------------------------------------------------------------------

  /** Decompressed-text row: `n_chars` of the UTF-8 payload, plus its
    * lowercase-hex MD5 (the cross-engine checksum — compressed BYTES
    * are encoder-dependent, decompressed CONTENT is the contract).
    */
  case class GzipText(media_id: Long, n_chars: Long, digest: String,
                      decode_ok: Boolean)

  /** GZIP-deflate `data` (deterministic: fixed level, no OS/mtime
    * header fields beyond the writer's defaults). Fixture writer for
    * the decompression path.
    */
  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  /** Inflate a gzip member; None on bad magic, truncation, or a
    * corrupt stream — the row-property contract. `maxBytes` bounds
    * decompression-bomb blowup (a 100 TB crawl column WILL contain
    * hostile frames): inflation stops past the cap and the blob
    * reports undecodable rather than OOMing the executor.
    */
  def gunzip(bytes: Array[Byte],
             maxBytes: Int = 1 << 26): Option[Array[Byte]] = {
    if (bytes.length < 18 || (bytes(0) & 0xff) != 0x1f ||
      (bytes(1) & 0xff) != 0x8b) return None
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > maxBytes) return None
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Partition-wise gzip text decode — the [[decodeWav]] contract:
    * one inflater pass per partition, blobs never shuffle; output is
    * (length, md5) METADATA, so downstream exchanges move hashes,
    * never payloads.
    */
  def decodeGzipText(blobs: Dataset[MediaBlob]): Dataset[GzipText] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      gunzip(b.content) match {
        case Some(data) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(data).map("%02x".format(_)).mkString
          GzipText(b.media_id,
            new String(data, "UTF-8").length.toLong, hex,
            decode_ok = true)
        case None =>
          GzipText(b.media_id, -1L, "", decode_ok = false)
      }
    })
  }

  /** Bounded copy of a decompression stream — the [[gunzip]]
    * bomb-cap contract shared by every codec leg below.
    */
  private def drainCapped(in: java.io.InputStream,
                          maxBytes: Int): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size() > maxBytes) return None
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None
      case _: RuntimeException => None }

  /** Inflate a raw zlib stream (0x78 CMF — html/http payloads show up
    * deflate-framed); None on corruption or past the bomb cap.
    */
  def inflateZlib(bytes: Array[Byte],
                  maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    if (bytes.length < 3 || (bytes(0) & 0xff) != 0x78) None
    else drainCapped(new java.util.zip.InflaterInputStream(
      new java.io.ByteArrayInputStream(bytes)), maxBytes)

  /** Decompress a zstandard frame (magic 28 B5 2F FD — the codec
    * CommonCrawl is migrating to). Streamed through zstd-jni's
    * ZstdInputStream, same bomb cap.
    */
  def unzstd(bytes: Array[Byte],
             maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    if (bytes.length < 5 || (bytes(0) & 0xff) != 0x28 ||
      (bytes(1) & 0xff) != 0xb5 || (bytes(2) & 0xff) != 0x2f ||
      (bytes(3) & 0xff) != 0xfd) None
    else drainCapped(new com.github.luben.zstd.ZstdInputStream(
      new java.io.ByteArrayInputStream(bytes)), maxBytes)

  /** Decompress an LZ4 FRAME (magic 04 22 4D 18). */
  def unlz4(bytes: Array[Byte],
            maxBytes: Int = 1 << 26): Option[Array[Byte]] =
    if (bytes.length < 7 || (bytes(0) & 0xff) != 0x04 ||
      (bytes(1) & 0xff) != 0x22 || (bytes(2) & 0xff) != 0x4d ||
      (bytes(3) & 0xff) != 0x18) None
    else drainCapped(new net.jpountz.lz4.LZ4FrameInputStream(
      new java.io.ByteArrayInputStream(bytes)), maxBytes)

  /** Compression sniff by magic bytes (the [[sniffFormat]] doctrine:
    * never trust an extension column). "none" = no known frame.
    */
  def sniffCompression(bytes: Array[Byte]): String = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length >= 18 && u(0) == 0x1f && u(1) == 0x8b) "gzip"
    else if (bytes.length >= 5 && u(0) == 0x28 && u(1) == 0xb5 &&
      u(2) == 0x2f && u(3) == 0xfd) "zstd"
    else if (bytes.length >= 7 && u(0) == 0x04 && u(1) == 0x22 &&
      u(2) == 0x4d && u(3) == 0x18) "lz4"
    else if (bytes.length >= 3 && u(0) == 0x78 &&
      (u(1) == 0x01 || u(1) == 0x5e || u(1) == 0x9c || u(1) == 0xda))
      "zlib"
    else "none"
  }

  /** Route a blob through its sniffed codec; "none" passes the bytes
    * through unchanged (an uncompressed member in a mixed column is
    * data, not an error). Returns (codec, bytes) or None when a
    * recognized frame fails to decompress.
    */
  def decompressAuto(bytes: Array[Byte],
                     maxBytes: Int = 1 << 26)
      : Option[(String, Array[Byte])] =
    sniffCompression(bytes) match {
      case "gzip" => gunzip(bytes, maxBytes).map("gzip" -> _)
      case "zstd" => unzstd(bytes, maxBytes).map("zstd" -> _)
      case "lz4"  => unlz4(bytes, maxBytes).map("lz4" -> _)
      case "zlib" => inflateZlib(bytes, maxBytes).map("zlib" -> _)
      case _      => Some("none" -> bytes)
    }

  /** One decompressed-text metadata row per blob: sniffed codec,
    * decoded length + md5 (content is the contract — compressed bytes
    * are encoder-dependent).
    */
  case class DecompressedText(media_id: Long, codec: String,
                              n_chars: Long, digest: String,
                              decode_ok: Boolean)

  /** Partition-wise mixed-codec text decompression — the
    * [[decodeGzipText]] contract over gzip/zstd/lz4/zlib/plain
    * columns.
    */
  def decompressText(blobs: Dataset[MediaBlob])
      : Dataset[DecompressedText] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      decompressAuto(b.content) match {
        case Some((codec, data)) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(data).map("%02x".format(_)).mkString
          DecompressedText(b.media_id, codec,
            new String(data, "UTF-8").length.toLong, hex,
            decode_ok = true)
        case None =>
          DecompressedText(b.media_id,
            sniffCompression(b.content), -1L, "", decode_ok = false)
      }
    })
  }

  /** Fixture writers for the zstd/lz4/zlib legs (gzip:
    * [[gzipBytes]]).
    */
  def zstdBytes(data: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, 3)

  def lz4Bytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  def zlibBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.util.zip.DeflaterOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Text encoding: crawl text lies about its charset (or says
  // nothing). Detection order is the practical web rule: BOM wins;
  // else strict UTF-8 validation; else Latin-1 (which decodes any
  // byte string). The decoded CONTENT is the cross-engine contract —
  // length + MD5 of the UTF-8 re-encoding — never the raw bytes.
  // ------------------------------------------------------------------

  /** Decoded-text row. `encoding` ∈ utf-8 / utf-16le / utf-16be /
    * latin-1 (empty string for empty input, decode_ok=false);
    * `n_chars` counts BMP chars (= codepoints for the web's working
    * set); `digest` is MD5 over the UTF-8 re-encoding.
    */
  case class TextBlob(media_id: Long, encoding: String,
                      has_bom: Boolean, n_chars: Long, digest: String,
                      decode_ok: Boolean)

  /** BOM sniff → strict UTF-8 validation (CharsetDecoder REPORT mode
    * — overlong forms, bare surrogates and truncated sequences all
    * fail) → Latin-1 fallback. A UTF-16 stream with a BOM but an odd
    * byte count is malformed and falls through to Latin-1 rather than
    * dropping bytes silently.
    */
  def detectAndDecodeText(id: Long, bytes: Array[Byte]): TextBlob = {
    import java.nio.charset.{CharacterCodingException, StandardCharsets}
    if (bytes.isEmpty)
      return TextBlob(id, "", has_bom = false, -1L, "",
        decode_ok = false)
    def u(i: Int): Int = bytes(i) & 0xff
    def md5utf8(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def strictUtf8(from: Int): Option[String] =
      try {
        val dec = StandardCharsets.UTF_8.newDecoder()
        Some(dec.decode(java.nio.ByteBuffer
          .wrap(bytes, from, bytes.length - from)).toString)
      } catch { case _: CharacterCodingException => None }
    val (enc, bom, text) =
      if (bytes.length >= 3 && u(0) == 0xef && u(1) == 0xbb &&
        u(2) == 0xbf) {
        strictUtf8(3) match {
          case Some(t) => ("utf-8", true, t)
          case None => ("latin-1", false,
            new String(bytes, StandardCharsets.ISO_8859_1))
        }
      } else if (bytes.length >= 2 && bytes.length % 2 == 0 &&
        u(0) == 0xff && u(1) == 0xfe) {
        ("utf-16le", true, new String(bytes, 2, bytes.length - 2,
          StandardCharsets.UTF_16LE))
      } else if (bytes.length >= 2 && bytes.length % 2 == 0 &&
        u(0) == 0xfe && u(1) == 0xff) {
        ("utf-16be", true, new String(bytes, 2, bytes.length - 2,
          StandardCharsets.UTF_16BE))
      } else strictUtf8(0) match {
        case Some(t) => ("utf-8", false, t)
        case None => ("latin-1", false,
          new String(bytes, StandardCharsets.ISO_8859_1))
      }
    TextBlob(id, enc, bom, text.length.toLong, md5utf8(text),
      decode_ok = true)
  }

  /** Partition-wise charset detection+decode — the [[decodeWav]]
    * contract: blobs never shuffle, output is metadata.
    */
  def decodeTextBlobs(blobs: Dataset[MediaBlob]): Dataset[TextBlob] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b =>
      detectAndDecodeText(b.media_id, b.content)))
  }

  // ------------------------------------------------------------------
  // MP4 / ISO-BMFF: the metadata video leg. Y4M is an interchange
  // format; 100 TB crawl video is MP4/MOV. A box walk (ftyp brand,
  // moov/mvhd timescale+duration, trak/tkhd dims, stsd sample-entry
  // 4CC) needs NO codec decode and makes dispatch honest on real
  // video columns — the parseJpeg pattern: Long-checked bounds, any
  // truncation or impossible size is a row property.
  // ------------------------------------------------------------------

  /** `brand` = ftyp major brand; `duration_ms` from mvhd
    * duration/timescale (floor); `width`/`height` from the FIRST tkhd
    * with nonzero 16.16 dims (the video track — audio tkhd carries
    * zeros); `codec` = the first stsd sample-entry 4CC in track order.
    */
  case class Mp4Meta(media_id: Long, brand: String, timescale: Int,
                     duration_ms: Long, n_tracks: Int, width: Int,
                     height: Int, codec: String, decode_ok: Boolean)

  private val BadMp4 =
    Mp4Meta(0L, "", -1, -1L, -1, -1, -1, "", decode_ok = false)

  /** ISO-BMFF box walk, metadata only. Box sizes are read as unsigned
    * (64-bit `largesize` honored, `size = 0` extends to the enclosing
    * end) and every bound is validated BEFORE use: a header past the
    * parent, a size smaller than its own header, or a payload past the
    * buffer routes the whole blob to decode_ok=false — truncated
    * crawl video must be a row property, never an
    * ArrayIndexOutOfBounds in a task.
    */
  def parseMp4(id: Long, bytes: Array[Byte]): Mp4Meta = {
    val n = bytes.length.toLong
    def u32(i: Int): Long =
      ((bytes(i) & 0xffL) << 24) | ((bytes(i + 1) & 0xffL) << 16) |
        ((bytes(i + 2) & 0xffL) << 8) | (bytes(i + 3) & 0xffL)
    def u64(i: Int): Long = (u32(i) << 32) | u32(i + 4)
    def ascii(i: Int, len: Int): String =
      new String(bytes, i, len, "US-ASCII")

    var brand = ""; var timescale = -1; var durMs = -1L
    var tracks = 0; var w = -1; var h = -1; var codec = ""
    var bad = false

    def walk(start: Long, end: Long)(
        f: (String, Long, Long) => Unit): Unit = {
      var off = start
      while (off < end && !bad) {
        if (off + 8 > end) { bad = true; return }
        var size = u32(off.toInt)
        val typ = ascii(off.toInt + 4, 4)
        var hdr = 8L
        if (size == 1L) {
          if (off + 16 > end) { bad = true; return }
          size = u64(off.toInt + 8); hdr = 16L
        } else if (size == 0L) size = end - off
        if (size < hdr || size > end - off) { bad = true; return }
        f(typ, off + hdr, off + size)
        off += size
      }
    }

    if (n < 8) return BadMp4.copy(media_id = id)
    walk(0L, n) { (t, s, e) =>
      t match {
        case "ftyp" =>
          if (e - s >= 4) brand = ascii(s.toInt, 4) else bad = true
        case "moov" => walk(s, e) { (t2, s2, e2) =>
          t2 match {
            case "mvhd" =>
              val ver = if (e2 - s2 >= 1) bytes(s2.toInt) & 0xff else -1
              if (ver == 1 && e2 - s2 >= 32) {
                val ts = u32(s2.toInt + 20)
                if (ts > 0 && ts <= Int.MaxValue) {
                  timescale = ts.toInt
                  durMs = u64(s2.toInt + 24) * 1000L / ts
                } else bad = true
              } else if (ver == 0 && e2 - s2 >= 20) {
                val ts = u32(s2.toInt + 12)
                if (ts > 0 && ts <= Int.MaxValue) {
                  timescale = ts.toInt
                  durMs = u32(s2.toInt + 16) * 1000L / ts
                } else bad = true
              } else bad = true
            case "trak" =>
              tracks += 1
              walk(s2, e2) { (t3, s3, e3) =>
                t3 match {
                  case "tkhd" =>
                    if (e3 - s3 >= 8) {
                      val tw = (u32((e3 - 8).toInt) >> 16).toInt
                      val th = (u32((e3 - 4).toInt) >> 16).toInt
                      if (tw > 0 && th > 0 && w < 0) { w = tw; h = th }
                    } else bad = true
                  case "mdia" => walk(s3, e3) { (t4, s4, e4) =>
                    if (t4 == "minf") walk(s4, e4) { (t5, s5, e5) =>
                      if (t5 == "stbl") walk(s5, e5) { (t6, s6, e6) =>
                        if (t6 == "stsd") {
                          if (e6 - s6 >= 16) {
                            if (codec.isEmpty)
                              codec = ascii(s6.toInt + 12, 4)
                          } else bad = true
                        }
                      }
                    }
                  }
                  case _ =>
                }
              }
            case _ =>
          }
        }
        case _ => // mdat, free, skip...
      }
    }
    if (bad || brand.isEmpty || timescale <= 0)
      BadMp4.copy(media_id = id)
    else Mp4Meta(id, brand, timescale, durMs, tracks, w, h, codec,
      decode_ok = true)
  }

  /** Partition-wise MP4 metadata decode — the [[decodeWav]] contract:
    * one parser pass per partition, blobs never shuffle.
    */
  def decodeMp4(blobs: Dataset[MediaBlob]): Dataset[Mp4Meta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseMp4(b.media_id, b.content)))
  }

  /** Genuine minimal ISO-BMFF file: ftyp + moov(mvhd + video trak
    * (tkhd dims + mdia/minf/stbl/stsd sample entry) [+ audio trak]) +
    * a small mdat. `v1` emits the 64-bit mvhd form. Deterministic per
    * id; any box-walking tool reads it back.
    */
  def syntheticMp4(id: Long, brand: String, timescale: Int,
                   duration: Long, width: Int, height: Int,
                   codec: String, v1: Boolean = false,
                   audioTrack: Boolean = false): MediaBlob = {
    require(timescale > 0 && duration >= 0 && width > 0 && height > 0)
    require(brand.length == 4 && codec.length == 4)
    def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val len = 8 + parts.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(typ.getBytes("US-ASCII"))
      parts.foreach(bb.put)
      bb.array()
    }
    val ftyp = box("ftyp", java.nio.ByteBuffer.allocate(12)
      .put(brand.getBytes("US-ASCII")).putInt(0)
      .put(brand.getBytes("US-ASCII")).array())
    val mvhdBody =
      if (v1) {
        val bb = java.nio.ByteBuffer.allocate(4 + 16 + 12 + 80)
        bb.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.putLong(0L).putLong(0L)           // creation, modification
        bb.putInt(timescale).putLong(duration)
        bb.putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
        bb.array()                            // rest zeros (matrix...)
      } else {
        val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 80)
        bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.putInt(0).putInt(0)
        bb.putInt(timescale).putInt(duration.toInt)
        bb.putInt(0x00010000).putShort(0x0100.toShort)
        bb.array()
      }
    def tkhd(trackId: Int, tw: Int, th: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.put(0.toByte).put(0.toByte).put(0.toByte).put(7.toByte)
      bb.putInt(0).putInt(0).putInt(trackId).putInt(0)
      bb.putInt(duration.toInt)
      bb.position(bb.position() + 52)        // reserved/layer/matrix
      bb.putInt(tw << 16).putInt(th << 16)   // 16.16 fixed
      box("tkhd", bb.array())
    }
    def stsdTrak(trackId: Int, tw: Int, th: Int,
                 fmt: String): Array[Byte] = {
      val entry = java.nio.ByteBuffer.allocate(16)
        .putInt(16).put(fmt.getBytes("US-ASCII"))
        .putInt(0).putInt(0).array()
      val stsd = box("stsd", java.nio.ByteBuffer.allocate(8)
        .putInt(0).putInt(1).array(), entry)
      box("trak", tkhd(trackId, tw, th),
        box("mdia", box("minf", box("stbl", stsd))))
    }
    val traks =
      if (audioTrack)
        // audio tkhd carries zero 16.16 dims by spec — the parser's
        // "first NONZERO dims win" rule is what this exercises
        Seq(stsdTrak(1, width, height, codec),
          stsdTrak(2, 0, 0, "mp4a"))
      else Seq(stsdTrak(1, width, height, codec))
    val moov = box("moov", box("mvhd", mvhdBody) +: traks: _*)
    val mdat = box("mdat", Array.tabulate[Byte](16)(i =>
      ((id * 31 + i) & 0xff).toByte))
    val all = ftyp ++ moov ++ mdat
    MediaBlob(id, "video/mp4", all)
  }

  // ------------------------------------------------------------------
  // MP3: the dominant crawl audio format (WAV is the interchange
  // format; podcast/speech crawls are MPEG audio). Metadata needs NO
  // codec decode — skip the ID3v2 tag (syncsafe size), read the FIRST
  // frame header's version/layer/bitrate/samplerate/mode bits, and
  // estimate CBR duration from the audio byte span. The parseJpeg
  // contract: every bound checked before use, any truncation or
  // reserved bit pattern is a row property, never a task failure.
  // ------------------------------------------------------------------

  /** `version` ∈ {"1","2","2.5"}; `layer` ∈ 1..3; `bitrate_kbps` from
    * the header index (free-format and the reserved index reject);
    * `duration_ms` = audio bytes (total minus ID3v2 tag and any
    * trailing ID3v1 block) × 8 / bitrate — exact for CBR, the honest
    * first-frame estimate for VBR (crawl triage, not playback).
    */
  case class Mp3Meta(media_id: Long, version: String, layer: Int,
                     bitrate_kbps: Int, sample_rate: Int, channels: Int,
                     id3_size: Int, duration_ms: Long,
                     decode_ok: Boolean)

  private val BadMp3 =
    Mp3Meta(0L, "", -1, -1, -1, -1, -1, -1L, decode_ok = false)

  /** Bitrate (kbps) by [mpeg1?][layer 1..3][index 1..14] and sample
    * rate by [version][index 0..2] — the ISO 11172-3 / 13818-3 header
    * tables, public in every MP3 header reference.
    */
  private val Mp3BitrateV1 = Array(
    Array(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
  private val Mp3BitrateV2 = Array(
    Array(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val Mp3SampleRate = Map(
    "1" -> Array(44100, 48000, 32000),
    "2" -> Array(22050, 24000, 16000),
    "2.5" -> Array(11025, 12000, 8000))

  /** ID3v2 tag length at the head of `bytes` (0 if none): 10-byte
    * header + 28-bit syncsafe size + optional 10-byte footer. -1 when
    * a declared tag overruns the buffer.
    */
  def id3v2Size(bytes: Array[Byte]): Int = {
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return 0
    def u(i: Int): Int = bytes(i) & 0xff
    // syncsafe: 4×7 bits, high bit of each byte must be clear
    if ((u(6) | u(7) | u(8) | u(9)) >= 0x80) return -1
    val body = (u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9)
    val footer = if ((u(5) & 0x10) != 0) 10 else 0
    val total = 10 + body + footer
    if (total > bytes.length) -1 else total
  }

  /** First-frame MPEG audio header parse, ID3-aware. The frame must
    * start exactly where the ID3v2 tag ends (offset 0 without one) —
    * crawl triage wants "is this a clean MP3", not a resync scan that
    * would bless any file containing two 0xFF bytes.
    */
  def parseMp3(id: Long, bytes: Array[Byte]): Mp3Meta = {
    val id3 = id3v2Size(bytes)
    if (id3 < 0 || bytes.length < id3 + 4) return BadMp3.copy(media_id = id)
    def u(i: Int): Int = bytes(i) & 0xff
    val h = id3
    if (u(h) != 0xff || (u(h + 1) & 0xe0) != 0xe0)
      return BadMp3.copy(media_id = id)
    val version = ((u(h + 1) >> 3) & 0x3) match {
      case 0 => "2.5"
      case 2 => "2"
      case 3 => "1"
      case _ => return BadMp3.copy(media_id = id) // reserved
    }
    val layer = ((u(h + 1) >> 1) & 0x3) match {
      case 1 => 3
      case 2 => 2
      case 3 => 1
      case _ => return BadMp3.copy(media_id = id) // reserved
    }
    val brIdx = (u(h + 2) >> 4) & 0xf
    val srIdx = (u(h + 2) >> 2) & 0x3
    // free-format (0) and the all-ones index (15) both reject: no
    // table entry exists, so no duration can be stated honestly
    if (brIdx == 0 || brIdx == 15 || srIdx == 3)
      return BadMp3.copy(media_id = id)
    val table = if (version == "1") Mp3BitrateV1 else Mp3BitrateV2
    val bitrate = table(layer - 1)(brIdx - 1)
    val rate = Mp3SampleRate(version)(srIdx)
    val channels = if (((u(h + 3) >> 6) & 0x3) == 3) 1 else 2
    // trailing ID3v1 block is metadata, not audio
    val id3v1 = if (bytes.length >= id3 + 4 + 128 &&
      bytes(bytes.length - 128) == 'T' && bytes(bytes.length - 127) == 'A' &&
      bytes(bytes.length - 126) == 'G') 128 else 0
    val audioBytes = (bytes.length - id3 - id3v1).toLong
    val durMs = audioBytes * 8L / bitrate
    Mp3Meta(id, version, layer, bitrate, rate, channels, id3, durMs,
      decode_ok = true)
  }

  /** Partition-wise MP3 metadata decode — the [[decodeWav]] contract. */
  def decodeMp3(blobs: Dataset[MediaBlob]): Dataset[Mp3Meta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseMp3(b.media_id, b.content)))
  }

  /** Genuine minimal MP3 stream: optional ID3v2 tag (zero-padded body
    * of `id3Body` bytes), `nFrames` correctly-sized frames of the
    * requested version/layer/bitrate/samplerate (frame length by the
    * standard formula, deterministic junk payload), optional trailing
    * ID3v1 block. Any header-table tool reads it back.
    */
  def syntheticMp3(id: Long, version: String, layer: Int,
                   bitrateKbps: Int, sampleRate: Int, mono: Boolean,
                   nFrames: Int, id3Body: Int = 0,
                   id3v1: Boolean = false): MediaBlob = {
    val table = if (version == "1") Mp3BitrateV1 else Mp3BitrateV2
    val brIdx = table(layer - 1).indexOf(bitrateKbps) + 1
    val srIdx = Mp3SampleRate(version).indexOf(sampleRate)
    require(brIdx >= 1 && srIdx >= 0,
      s"syntheticMp3: no header index for ${bitrateKbps}kbps/$sampleRate" +
        s"Hz in MPEG-$version layer $layer")
    val verBits = version match {
      case "1" => 3; case "2" => 2; case _ => 0
    }
    val layerBits = 4 - layer
    val frameLen =
      if (layer == 1)
        (12 * bitrateKbps * 1000 / sampleRate) * 4
      else {
        val coef = if (layer == 3 && version != "1") 72 else 144
        coef * bitrateKbps * 1000 / sampleRate
      }
    val out = new java.io.ByteArrayOutputStream()
    if (id3Body > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0) // v2.4, no flags
      out.write((id3Body >> 21) & 0x7f); out.write((id3Body >> 14) & 0x7f)
      out.write((id3Body >> 7) & 0x7f); out.write(id3Body & 0x7f)
      out.write(new Array[Byte](id3Body))
    }
    val hdr = Array[Int](0xff,
      0xe0 | (verBits << 3) | (layerBits << 1) | 1,
      (brIdx << 4) | (srIdx << 2),
      (if (mono) 0xc0 else 0x00))
    for (f <- 0 until nFrames) {
      hdr.foreach(out.write)
      for (i <- 4 until frameLen)
        out.write(((id * 131 + f * 17 + i) & 0xff).toInt)
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      out.write(new Array[Byte](125))
    }
    MediaBlob(id, "audio/mpeg", out.toByteArray)
  }

  /** ID3v2 text tags — the metadata a speech/music curation pipeline
    * actually keys on (dedup by (artist, title), language/topic
    * routing by album). `id3_version` ∈ {"2.3","2.4"}; absent frames
    * are empty strings; a missing or malformed tag is
    * decode_ok=false.
    */
  case class Id3Tags(media_id: Long, id3_version: String, title: String,
                     artist: String, album: String, decode_ok: Boolean)

  private val BadId3 = Id3Tags(0L, "", "", "", "", decode_ok = false)

  /** Parse the leading ID3v2.3/2.4 tag's TIT2/TPE1/TALB text frames.
    * Frame sizes are plain big-endian in 2.3 and syncsafe in 2.4 (THE
    * classic cross-version parsing bug — a 2.4 size read as plain
    * overruns into the next frame); text decodes by the frame's
    * encoding byte (0 ISO-8859-1, 1 UTF-16 with BOM, 2 UTF-16BE,
    * 3 UTF-8), trailing NUL terminators stripped. Padding (a zero
    * byte where a frame id should start) ends the walk. Any frame
    * overrunning the tag bound rejects the whole blob — row property,
    * never a task failure.
    */
  def parseId3(id: Long, bytes: Array[Byte]): Id3Tags = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 10 || bytes(0) != 'I' || bytes(1) != 'D' ||
      bytes(2) != '3') return BadId3.copy(media_id = id)
    val major = u(3)
    if (major != 3 && major != 4) return BadId3.copy(media_id = id)
    if ((u(6) | u(7) | u(8) | u(9)) >= 0x80)
      return BadId3.copy(media_id = id)
    val body = (u(6) << 21) | (u(7) << 14) | (u(8) << 7) | u(9)
    val tagEnd = 10 + body
    if (tagEnd > bytes.length) return BadId3.copy(media_id = id)
    var title = ""; var artist = ""; var album = ""
    var off = 10
    var bad = false
    var done = false
    while (!done && !bad && off + 10 <= tagEnd) {
      if (bytes(off) == 0) done = true
      else {
        val fid = new String(bytes, off, 4, "US-ASCII")
        val size =
          if (major == 4) {
            if ((u(off + 4) | u(off + 5) | u(off + 6) | u(off + 7))
              >= 0x80) { bad = true; 0 }
            else (u(off + 4) << 21) | (u(off + 5) << 14) |
              (u(off + 6) << 7) | u(off + 7)
          } else (u(off + 4) << 24) | (u(off + 5) << 16) |
            (u(off + 6) << 8) | u(off + 7)
        if (!bad && (size < 1 || off + 10 + size > tagEnd)) bad = true
        if (!bad && Set("TIT2", "TPE1", "TALB").contains(fid)) {
          val cs = u(off + 10) match {
            case 0 => "ISO-8859-1"
            case 1 => "UTF-16"   // BOM-led, per spec
            case 2 => "UTF-16BE"
            case 3 => "UTF-8"
            case _ => ""
          }
          if (cs.isEmpty) bad = true
          else {
            val txt = new String(bytes, off + 11, size - 1, cs)
              .replaceAll("\u0000+$", "")
            fid match {
              case "TIT2" => title = txt
              case "TPE1" => artist = txt
              case _      => album = txt
            }
          }
        }
        off += 10 + size
      }
    }
    if (bad) BadId3.copy(media_id = id)
    else Id3Tags(id, if (major == 4) "2.4" else "2.3", title, artist,
      album, decode_ok = true)
  }

  /** Partition-wise ID3 tag decode — the [[decodeWav]] contract. */
  def decodeId3(blobs: Dataset[MediaBlob]): Dataset[Id3Tags] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseId3(b.media_id, b.content)))
  }

  /** Genuine tagged MP3: an ID3v2.3 or 2.4 tag carrying TIT2/TPE1/
    * TALB in the requested encoding (correct per-version frame-size
    * form, NUL terminators, 16 bytes of padding) prepended to a valid
    * [[syntheticMp3]] frame stream — both parsers read their half
    * back ([[parseMp3]] skips the tag by its syncsafe size).
    */
  def syntheticTaggedMp3(id: Long, title: String, artist: String,
                         album: String, v4: Boolean,
                         enc: Int): MediaBlob = {
    require(Set(0, 1, 3).contains(enc),
      "syntheticTaggedMp3: generator emits encodings 0/1/3")
    val cs = enc match {
      case 0 => "ISO-8859-1"
      case 1 => "UTF-16"   // Java writes a BOM + UTF-16BE payload
      case _ => "UTF-8"
    }
    val term = if (enc == 1) Array[Byte](0, 0) else Array[Byte](0)
    def frame(fid: String, text: String): Array[Byte] = {
      val payload = Array(enc.toByte) ++ text.getBytes(cs) ++ term
      val n = payload.length
      val sz =
        if (v4) Array(((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
          ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte)
        else Array((n >>> 24).toByte, ((n >> 16) & 0xff).toByte,
          ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)
      fid.getBytes("US-ASCII") ++ sz ++ Array[Byte](0, 0) ++ payload
    }
    val bodyArr = frame("TIT2", title) ++ frame("TPE1", artist) ++
      frame("TALB", album) ++ new Array[Byte](16)
    val n = bodyArr.length
    val header = Array[Byte]('I', 'D', '3',
      (if (v4) 4 else 3).toByte, 0, 0,
      ((n >> 21) & 0x7f).toByte, ((n >> 14) & 0x7f).toByte,
      ((n >> 7) & 0x7f).toByte, (n & 0x7f).toByte)
    val audio = syntheticMp3(id, "1", 3, 128, 44100, mono = true,
      nFrames = 2).content
    MediaBlob(id, "audio/mpeg", header ++ bodyArr ++ audio)
  }

  // ------------------------------------------------------------------
  // FLAC: the lossless audio leg. STREAMINFO (the mandatory first
  // metadata block) carries everything triage needs in 34 fixed-layout
  // bytes — sample rate, channels, bit depth, total samples.
  // ------------------------------------------------------------------

  /** `total_samples` = 0 means "unknown" per spec and reports
    * `duration_ms` = -1; all other fields exact from STREAMINFO.
    */
  case class FlacMeta(media_id: Long, sample_rate: Int, channels: Int,
                      bits_per_sample: Int, total_samples: Long,
                      duration_ms: Long, decode_ok: Boolean)

  private val BadFlac =
    FlacMeta(0L, -1, -1, -1, -1L, -1L, decode_ok = false)

  /** fLaC magic + STREAMINFO parse. The spec REQUIRES STREAMINFO to be
    * the first metadata block — a stream leading with anything else is
    * malformed and rejects, as does a declared block overrunning the
    * buffer or a zero sample rate.
    */
  def parseFlac(id: Long, bytes: Array[Byte]): FlacMeta = {
    def u(i: Int): Int = bytes(i) & 0xff
    if (bytes.length < 4 + 4 + 34 || bytes(0) != 'f' || bytes(1) != 'L' ||
      bytes(2) != 'a' || bytes(3) != 'C') return BadFlac.copy(media_id = id)
    val blockType = u(4) & 0x7f
    val blockLen = (u(5) << 16) | (u(6) << 8) | u(7)
    if (blockType != 0 || blockLen < 34 ||
      8L + blockLen > bytes.length) return BadFlac.copy(media_id = id)
    val s = 8 + 10 // skip min/max blocksize (4) + min/max framesize (6)
    // 64 bits: 20 samplerate | 3 channels-1 | 5 bps-1 | 36 totalSamples
    var acc = 0L
    for (i <- 0 until 8) acc = (acc << 8) | u(s + i)
    val rate = (acc >>> 44).toInt
    val channels = ((acc >>> 41) & 0x7).toInt + 1
    val bps = ((acc >>> 36) & 0x1f).toInt + 1
    val total = acc & 0xfffffffffL
    if (rate <= 0) return BadFlac.copy(media_id = id)
    val durMs = if (total == 0L) -1L else total * 1000L / rate
    FlacMeta(id, rate, channels, bps, total, durMs, decode_ok = true)
  }

  /** Partition-wise FLAC metadata decode — the [[decodeWav]] contract. */
  def decodeFlac(blobs: Dataset[MediaBlob]): Dataset[FlacMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseFlac(b.media_id, b.content)))
  }

  /** Genuine minimal FLAC header: magic + last-block STREAMINFO with
    * the given parameters (zero min/max frame sizes, deterministic
    * MD5-field junk) + a few payload bytes. Any STREAMINFO reader
    * parses it back.
    */
  def syntheticFlac(id: Long, sampleRate: Int, channels: Int,
                    bitsPerSample: Int, totalSamples: Long): MediaBlob = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0L && totalSamples < (1L << 36))
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0x80) // last-metadata-block flag + type 0 (STREAMINFO)
    out.write(0); out.write(0); out.write(34)
    val blockSize = 4096
    out.write(blockSize >> 8); out.write(blockSize & 0xff)
    out.write(blockSize >> 8); out.write(blockSize & 0xff)
    for (_ <- 0 until 6) out.write(0) // min/max frame size unknown
    var acc = (sampleRate.toLong << 44) |
      ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples
    for (i <- 7 to 0 by -1) out.write(((acc >>> (8 * i)) & 0xff).toInt)
    for (i <- 0 until 16) out.write(((id * 37 + i) & 0xff).toInt)
    for (i <- 0 until 8) out.write(((id * 53 + i) & 0xff).toInt)
    MediaBlob(id, "audio/flac", out.toByteArray)
  }

  // ------------------------------------------------------------------
  // OGG: the streaming-audio container (Opus is the web-voice codec;
  // Vorbis the legacy one). The first page's payload is the codec's
  // identification header — channels/rate without any codec decode.
  // ------------------------------------------------------------------

  /** `codec` ∈ {"opus","vorbis","unknown"}; for Opus `sample_rate` is
    * the ORIGINAL input rate the header records (Opus itself always
    * decodes at 48 kHz) and `pre_skip` the startup samples to drop;
    * Vorbis reports -1 pre-skip. A well-formed page wrapping an
    * unrecognized first packet keeps decode_ok=false with
    * codec="unknown" — container and codec are separate facts.
    */
  case class OggMeta(media_id: Long, codec: String, channels: Int,
                     sample_rate: Int, pre_skip: Int,
                     decode_ok: Boolean)

  private val BadOgg = OggMeta(0L, "", -1, -1, -1, decode_ok = false)

  /** First-page Ogg parse: capture pattern, stream-structure version
    * 0, segment table bounds, then the payload against the OpusHead
    * (LE fields) and 0x01+"vorbis" (LE fields) identification
    * layouts. Truncation anywhere is a row property.
    */
  def parseOgg(id: Long, bytes: Array[Byte]): OggMeta = {
    def u(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    if (bytes.length < 28 || bytes(0) != 'O' || bytes(1) != 'g' ||
      bytes(2) != 'g' || bytes(3) != 'S' || u(4) != 0)
      return BadOgg.copy(media_id = id)
    val nsegs = u(26)
    if (bytes.length < 27 + nsegs) return BadOgg.copy(media_id = id)
    var payloadLen = 0
    var i = 0
    while (i < nsegs) { payloadLen += u(27 + i); i += 1 }
    val p = 27 + nsegs
    if (bytes.length < p + payloadLen) return BadOgg.copy(media_id = id)
    def ascii(off: Int, n: Int): String =
      new String(bytes, off, n, "US-ASCII")
    if (payloadLen >= 19 && ascii(p, 8) == "OpusHead") {
      val channels = u(p + 9)
      val preSkip = le16(p + 10)
      val rate = le32(p + 12)
      if (channels < 1 || rate <= 0 || rate > Int.MaxValue)
        BadOgg.copy(media_id = id)
      else OggMeta(id, "opus", channels, rate.toInt, preSkip,
        decode_ok = true)
    } else if (payloadLen >= 16 && u(p) == 1 &&
      ascii(p + 1, 6) == "vorbis") {
      val channels = u(p + 11)
      val rate = le32(p + 12)
      if (channels < 1 || rate <= 0 || rate > Int.MaxValue)
        BadOgg.copy(media_id = id)
      else OggMeta(id, "vorbis", channels, rate.toInt, -1,
        decode_ok = true)
    } else OggMeta(id, "unknown", -1, -1, -1, decode_ok = false)
  }

  /** Partition-wise Ogg metadata decode — the [[decodeWav]] contract. */
  def decodeOgg(blobs: Dataset[MediaBlob]): Dataset[OggMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => parseOgg(b.media_id, b.content)))
  }

  /** Genuine single-page Ogg stream wrapping an Opus or Vorbis
    * identification header (codec = "opus" | "vorbis" | anything else
    * for an unknown-first-packet page). CRC left zero — readers of
    * identification metadata do not verify page checksums.
    */
  def syntheticOgg(id: Long, codec: String, channels: Int, rate: Int,
                   preSkip: Int = 312): MediaBlob = {
    val payload: Array[Byte] = codec match {
      case "opus" =>
        "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1.toByte,
          channels.toByte, (preSkip & 0xff).toByte,
          ((preSkip >> 8) & 0xff).toByte,
          (rate & 0xff).toByte, ((rate >> 8) & 0xff).toByte,
          ((rate >> 16) & 0xff).toByte, ((rate >> 24) & 0xff).toByte,
          0, 0, 0)
      case "vorbis" =>
        Array(1.toByte) ++ "vorbis".getBytes("US-ASCII") ++
          Array[Byte](0, 0, 0, 0, channels.toByte,
            (rate & 0xff).toByte, ((rate >> 8) & 0xff).toByte,
            ((rate >> 16) & 0xff).toByte, ((rate >> 24) & 0xff).toByte,
            0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
      case _ => ("JUNK" + codec).getBytes("US-ASCII")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write('O'); out.write('g'); out.write('g'); out.write('S')
    out.write(0); out.write(0x02) // version, BOS
    for (_ <- 0 until 8) out.write(0)   // granule
    for (i <- 0 until 4) out.write(((id >> (8 * i)) & 0xff).toInt)
    for (_ <- 0 until 4) out.write(0)   // page seq
    for (_ <- 0 until 4) out.write(0)   // crc (unverified)
    // segment lacing: 255-byte segments + remainder
    val full = payload.length / 255
    out.write(full + 1)
    for (_ <- 0 until full) out.write(255)
    out.write(payload.length % 255)
    out.write(payload)
    MediaBlob(id, "audio/ogg", out.toByteArray)
  }

  // HETEROGENEOUS — one blob column carrying WAV next to PNG next to
  // JPEG next to Y4M. Each decode operator above assumes a homogeneous
  // column; dispatchDecode is the missing composition: sniff the magic
  // bytes, route each blob to its codec's parser, surface one unified
  // row. One partition-wise pass, blobs never shuffle, unknown or
  // corrupted magic stays a row property (format='unknown',
  // decode_ok=false) — never a task failure.
  // ------------------------------------------------------------------

  /** Unified dispatch row: `format` is the sniffed container; fields
    * a codec doesn't carry hold -1 (channels doubles as JPEG's
    * component count — both answer "how many interleaved planes").
    */
  case class DispatchedMeta(media_id: Long, format: String,
                            decode_ok: Boolean, width: Int, height: Int,
                            sample_rate: Int, channels: Int, frames: Int,
                            duration_ms: Long)

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
    // ISO-BMFF: the ftyp box type at offset 4 (its 4-byte size varies)
    else if (bytes.length >= 12 && ascii(4, 4) == "ftyp") "mp4"
    else if (bytes.length >= 18 && u(0) == 0x1f && u(1) == 0x8b) "gzip"
    else if (bytes.length >= 4 && ascii(0, 4) == "fLaC") "flac"
    else if (bytes.length >= 5 && ascii(0, 4) == "OggS" && u(4) == 0)
      "ogg"
    // MPEG audio: an ID3v2 tag, or a bare frame sync with non-reserved
    // version/layer bits (checked LAST — the sync pattern is the
    // weakest magic in the chain; every stronger signature wins first)
    else if (bytes.length >= 3 && ascii(0, 3) == "ID3") "mp3"
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
          -1, -1, -1, -1L)
      case "gif" =>
        val g = parseGif(id, bytes)
        DispatchedMeta(id, "gif", g.decode_ok, g.width, g.height, -1,
          -1, -1, -1L)
      case "mp4" =>
        val v = parseMp4(id, bytes)
        // channels doubles as track count here — both answer "how
        // many interleaved streams" (the DispatchedMeta contract)
        DispatchedMeta(id, "mp4", v.decode_ok, v.width, v.height, -1,
          if (v.decode_ok) v.n_tracks else -1, -1, v.duration_ms)
      case "gzip" =>
        // container-only leg: decode_ok = the member inflates clean
        DispatchedMeta(id, "gzip", gunzip(bytes).isDefined, -1, -1,
          -1, -1, -1, -1L)
      case "mp3" =>
        val a = parseMp3(id, bytes)
        DispatchedMeta(id, "mp3", a.decode_ok, -1, -1, a.sample_rate,
          a.channels, -1, a.duration_ms)
      case "flac" =>
        val fl = parseFlac(id, bytes)
        DispatchedMeta(id, "flac", fl.decode_ok, -1, -1, fl.sample_rate,
          fl.channels, -1, fl.duration_ms)
      case "ogg" =>
        val og = parseOgg(id, bytes)
        DispatchedMeta(id, "ogg", og.decode_ok, -1, -1, og.sample_rate,
          og.channels, -1, -1L)
      case _ =>
        DispatchedMeta(id, "unknown", decode_ok = false, -1, -1, -1,
          -1, -1, -1L)
    }

  /** Partition-wise heterogeneous decode — the same plan shape as the
    * homogeneous operators ([[decodeWav]]/[[decodePng]]/...): one
    * sniffer+parser pass per partition, blobs never shuffle.
    */
  def dispatchDecode(blobs: Dataset[MediaBlob]): Dataset[DispatchedMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => dispatchOne(b.media_id, b.content)))
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
        // metadata-only legs: no byte-level transform exists, so a
        // valid stream passes through (dropping it would silently
        // empty every WebP/GIF/MP4/MP3/FLAC in a mixed crawl column)
        case "webp" | "gif" | "mp4" | "mp3" | "flac" | "ogg" =>
          Some(b.content)
        case _      => None
      }
      MediaBlob(b.media_id, b.media_type,
        out.getOrElse(Array.emptyByteArray))
    })
  }

}
