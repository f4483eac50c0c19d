package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{DecodedMeta, MediaBlob}

/** Multimodal binary-column plumbing: synthetic blobs, partition-wise
  * decode stub with failure routing, frame plan, per-frame features.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("decodeStub parses header metadata partition-wise; malformed " +
    "blobs route to decode_ok=false instead of failing the task") {
    val blobs = Seq(
      Multimodal.syntheticBlob(1L, "image", 640, 480, 100),
      Multimodal.syntheticBlob(2L, "video", 1920, 1080, 500),
      MediaBlob(3L, "image", Array[Byte](1, 2, 3)),          // truncated
      MediaBlob(4L, "image", new Array[Byte](16))            // bad magic
    ).toDS().repartition(3)
    val out = Multimodal.decodeStub(blobs).collect()
      .sortBy(_.media_id)
    assert(out(0) == DecodedMeta(1L, "image", 640, 480, 100L, true))
    assert(out(1) == DecodedMeta(2L, "video", 1920, 1080, 500L, true))
    assert(!out(2).decode_ok && !out(3).decode_ok)
  }

  test("syntheticBlob content is deterministic per id") {
    val a = Multimodal.syntheticBlob(7L, "image", 10, 10, 64)
    val b = Multimodal.syntheticBlob(7L, "image", 10, 10, 64)
    val c = Multimodal.syntheticBlob(8L, "image", 10, 10, 64)
    assert(a.content.toSeq == b.content.toSeq)
    assert(a.content.toSeq != c.content.toSeq)
  }

  test("frameSample caps frames and keeps metadata columns") {
    val media = Seq((1L, 1000L), (2L, 5000L), (3L, 60000L))
      .toDF("media_id", "duration_ms")
    val out = Multimodal.frameSample(media, "media_id", "duration_ms",
        everyMs = 2000L, maxFrames = 5)
      .groupBy($"media_id").agg(count(lit(1)).as("n"),
        max($"frame_ts_ms").as("last_ts"))
      .orderBy($"media_id").collect()
    // 1000ms → 1 frame; 5000ms → 3 frames (0,2000,4000); 60000ms → cap 5
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 0L), (2L, 3L, 4000L), (3L, 5L, 8000L)))
  }

  test("frameFeatures emits deterministic bounded vectors per frame") {
    val frames = Seq((1L, 0L), (1L, 1L), (1L, 0L)).toDF("id", "frame_no")
    val out = Multimodal.frameFeatures(frames, "id", "frame_no", dim = 8)
      .collect().map(_.getSeq[Double](2))
    assert(out(0) == out(2))             // deterministic
    assert(out(0) != out(1))
    assert(out.flatten.forall(v => v >= -1.0 && v < 1.0))
  }
}
