package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

case class WavMeta(media_id: Long, sample_rate: Int, channels: Int,
                   bits_per_sample: Int, data_bytes: Long,
                   duration_ms: Long, decode_ok: Boolean)

case class WavStats(media_id: Long, channel: Int, n_samples: Long,
                    peak: Int, sum_abs: Long, sum_sq: Long,
                    decode_ok: Boolean)

/** One fixed-length analysis window of a PCM stream: exact-integer
  * per-window signal statistics over all channels interleaved
  * (window boundaries are frame-aligned; `start_ms` floors
  * `window_no · winFrames · 1000 / rate` in long arithmetic).
  */
case class WavWindow(media_id: Long, window_no: Int, start_ms: Long,
                     n_frames: Int, peak: Int, sum_abs: Long,
                     sum_sq: Long, decode_ok: Boolean)

/** WAV/RIFF: headers, per-channel stats, windows, resample/normalize/trim transcodes.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait WavCodec extends Serializable {

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
      : (Option[(Int, Int, Int, Int, Int)], Int, Long) = {
    def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // +format code
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val cid = ascii(off)
      val size = buf.getInt(off + 4).toLong & 0xFFFFFFFFL
      val body = off + 8
      cid match {
        case "fmt " if size >= 16 && body + 16 <= bytes.length =>
          fmt = Some((buf.getShort(body).toInt,
            buf.getShort(body + 2).toInt, buf.getInt(body + 4),
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
      case (Some((_, ch, rate, byteRate, bits)), _, dataLen)
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
  /** ITU-T G.711 µ-law expansion to linear 16-bit — exact integer
    * arithmetic (BIAS 0x84 segment decode), replayable by any engine
    */
  def ulawToPcm(b: Int): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 0x07)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion (0x55 toggle, segment decode) */
  def alawToPcm(b: Int): Int = {
    val a = b ^ 0x55
    val man = (a & 0x0f) << 4
    val seg = (a >> 4) & 0x07
    val t =
      if (seg == 0) man + 8
      else (man + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  def wavStats(id: Long, bytes: Array[Byte]): Seq[WavStats] = {
    val meta = parseWav(id, bytes)
    if (!meta.decode_ok) return Seq(BadWavStats.copy(media_id = id))
    // the SAME walk parseWav ran (shared helper) hands back the data
    // chunk's body offset and the fmt tag's audio format code
    val (fmt, dataOff, _) = wavChunkWalk(bytes)
    val format = fmt.map(_._1).getOrElse(-1)
    // supported sample layouts: linear PCM16, and the two G.711
    // companded telephony codings (8-bit µ-law / A-law — real IVR and
    // call-center corpora ship these), expanded with the exact ITU
    // integer formulas before the same stats fold
    val sampleBytes = (format, meta.bits_per_sample) match {
      case (1, 16) => 2
      case (6, 8) | (7, 8) => 1
      case _ => return Seq(BadWavStats.copy(media_id = id))
    }
    val ch = meta.channels
    if (ch < 1 || meta.data_bytes % (sampleBytes.toLong * ch) != 0 ||
        meta.data_bytes > Int.MaxValue || dataOff < 0)
      return Seq(BadWavStats.copy(media_id = id))
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val frames = (meta.data_bytes / (sampleBytes.toLong * ch)).toInt
    val peak = new Array[Int](ch)
    val sAbs = new Array[Long](ch)
    val sSq = new Array[Long](ch)
    var i = 0
    while (i < frames * ch) {
      val s =
        if (sampleBytes == 2) buf.getShort(dataOff + i * 2).toInt
        else if (format == 7) ulawToPcm(bytes(dataOff + i) & 0xff)
        else alawToPcm(bytes(dataOff + i) & 0xff)
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

  /** Genuine G.711 WAV: the 44-byte layout with format code 7 (µ-law)
    * or 6 (A-law), 8-bit samples, byte payload supplied by the caller
    */
  def wavG711Bytes(sampleRate: Int, channels: Int, ulaw: Boolean,
                   payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(if (ulaw) 7 else 6).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels)
      .putShort(channels.toShort).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(payload.length)
      .put(payload)
    bb.array()
  }

  /** Partition-wise per-channel stats over a Dataset of blobs — one
    * decoder per partition, blobs never shuffle, one output row per
    * (blob, channel).
    */
  def decodeWavStats(blobs: Dataset[MediaBlob]): Dataset[WavStats] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(b => wavStats(b.media_id, b.content)))
  }


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
}
