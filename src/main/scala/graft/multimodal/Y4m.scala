package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

case class Y4mMeta(media_id: Long, width: Int, height: Int,
                   fps_num: Int, fps_den: Int, frames: Int,
                   frame_bytes: Long, duration_ms: Long,
                   decode_ok: Boolean)

case class VideoFrame(media_id: Long, frame_no: Int,
                      frame_ts_ms: Long, frame: Array[Byte])

/** One resized sampled video frame: raw planar YUV 4:2:0 payload at
  * the target dims (width·height·3/2 bytes).
  */
case class ResizedFrame(media_id: Long, frame_no: Int, width: Int,
                        height: Int, frame: Array[Byte])

/** One frame's temporal-analysis row: mean luma, the delta to the
  * previous frame (null on frame 0), the threshold cut flag, and
  * the running scene number (count of cuts so far).
  */
case class SceneCut(media_id: Long, frame_no: Int, mean_luma: Double,
                    delta: Option[Double], is_cut: Boolean,
                    scene_no: Long)

/** Y4M (YUV4MPEG2) video: header/stream parse, frame sampling, per-frame resize, container transcode, scene cuts, metadata-only frame planning.
  *
  * One slice of [[Multimodal]] (mixed in there; call sites use
  * `Multimodal.*`) — split per codec for reviewability, no behavior
  * change.
  */
private[multimodal] trait Y4mCodec extends Serializable {

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

}
