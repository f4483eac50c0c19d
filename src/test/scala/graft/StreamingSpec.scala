package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams
import graft.streaming.Streams.{ClosedSession, SessionEvent}

/** Structured Streaming operators (ST1-ST3): micro-batch incremental
  * upsert, watermarked tumbling windows, flatMapGroupsWithState
  * sessionization — each checked against its batch twin.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  test("incrementalUpsert: stream batches MERGE into the keyed table " +
    "and replays are idempotent") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream").toString
    val table = s"$dir/articles"
    // seed table: two unsummarized articles
    Seq((1L, "alpha text", null: String), (2L, "beta text", null: String))
      .toDF("doc_id", "text", "summary")
      .write.parquet(table)

    val stream = MemoryStream[(Long, String)]
    val stage = (b: org.apache.spark.sql.DataFrame) =>
      b.select(col("_1").as("doc_id"),
        concat(lit("sum:"), col("_2")).as("summary"))

    stream.addData((1L, "alpha text"))
    val q1 = Streams.incrementalUpsert(stream.toDF(), stage, table,
      Seq("doc_id"), s"$dir/cp1")
    q1.awaitTermination()

    val afterFirst = spark.read.parquet(table)
      .orderBy("doc_id").collect()
    assert(afterFirst.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      Seq((1L, "sum:alpha text"), (2L, null)))

    // replay the same payload (new stream+checkpoint = redelivery):
    // ST3 — the patch upsert is idempotent, text column untouched
    val replay = MemoryStream[(Long, String)]
    replay.addData((1L, "alpha text"))
    val q2 = Streams.incrementalUpsert(replay.toDF(), stage, table,
      Seq("doc_id"), s"$dir/cp2")
    q2.awaitTermination()
    val afterReplay = spark.read.parquet(table)
      .orderBy("doc_id").collect()
    assert(afterReplay.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((1L, "alpha text", "sum:alpha text"),
        (2L, "beta text", null)))
  }

  test("streamingDedup: cross-batch near-dup pairs surface via the " +
    "persisted signature index") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val textA = "the quick brown fox jumps over the lazy dog again and " +
      "again until everyone is thoroughly bored of the sentence"
    val textB = "completely unrelated content about spark structured " +
      "streaming micro batch execution and checkpoint recovery semantics"
    val stream = MemoryStream[(Long, String)]
    // batch 1: A and an unrelated doc
    stream.addData((1L, textA), (2L, textB))
    val q1 = Streams.streamingDedup(
      stream.toDF().select(col("_1").as("id"), col("_2").as("text")),
      "id", "text", s"$dir/index", s"$dir/cands", s"$dir/cp1")
    q1.awaitTermination()
    // batch 2 (fresh query, same index): an exact copy of A
    val stream2 = MemoryStream[(Long, String)]
    stream2.addData((10L, textA))
    val q2 = Streams.streamingDedup(
      stream2.toDF().select(col("_1").as("id"), col("_2").as("text")),
      "id", "text", s"$dir/index", s"$dir/cands", s"$dir/cp2")
    q2.awaitTermination()
    val cands = spark.read.parquet(s"$dir/cands").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the cross-batch pair (1, 10) must surface — batch 2 never saw
    // doc 1's text, only its signature in the index
    assert(cands.contains((1L, 10L)), s"got $cands")
    assert(!cands.exists(p => p._1 == 2L || p._2 == 2L))
    // index now holds all three docs' band buckets (8 bands each)
    assert(spark.read.parquet(s"$dir/index")
      .select("id").distinct().count() == 3)
    assert(spark.read.parquet(s"$dir/index").count() == 24)
  }

  test("incrementalSketch: streamed slice sketches roll up to the " +
    "batch build's estimates — history never rescanned") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-ssketch").toString
    val rows = (0 until 600).map(i => (s"g${i % 3}", (i % 211).toLong))
    val stream = MemoryStream[(String, Long)]
    val q = Streams.incrementalSketch(
      stream.toDF().select(col("_1").as("g"), col("_2").as("v")),
      Seq("g"), "v", s"$dir/sketches", s"$dir/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    rows.grouped(200).foreach { chunk =>
      stream.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    // one sketch row per (group, micro-batch)
    assert(spark.read.parquet(s"$dir/sketches").count() == 9)
    val streamed = graft.operators.Sketches
      .mergeEstimate(spark.read.parquet(s"$dir/sketches"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = graft.operators.Sketches.mergeEstimate(
      graft.operators.Sketches.sketchTable(
        rows.toDF("g", "v"), Seq("g"), "v"), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(streamed == batch,
      s"streamed $streamed != batch $batch")
  }

  test("streamingDedup replay: re-delivered batch re-appends the same " +
    "pairs — distinct-on-read recovers the exact candidate set") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sdedup2").toString
    val text = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen"
    def deliver(cp: String): Unit = {
      val st = MemoryStream[(Long, String)]
      st.addData((1L, text), (2L, text))
      Streams.streamingDedup(
        st.toDF().select(col("_1").as("id"), col("_2").as("text")),
        "id", "text", s"$dir/index", s"$dir/cands", s"$dir/$cp")
        .awaitTermination()
    }
    deliver("cp1")
    val once = spark.read.parquet(s"$dir/cands")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == Set((1L, 2L)))
    // redelivery (fresh checkpoint = at-least-once replay)
    deliver("cp2")
    val raw = spark.read.parquet(s"$dir/cands").collect()
    val distinct = raw.map(r => (r.getLong(0), r.getLong(1))).toSet
    // appended twice, but the SET is unchanged — the documented
    // dedupe-on-(id_a,id_b) downstream contract holds
    assert(raw.length > once.size)
    assert(distinct == once)
  }

  test("dedupedStream admits each run key once across micro-batches") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Timestamp)]
    val query = graft.streaming.Streams.dedupedStream(
        stream.toDF().toDF("run_key", "ts"), "run_key", "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    stream.addData(("u1", ts(0)), ("u2", ts(1)), ("u1", ts(2)))
    query.processAllAvailable()
    stream.addData(("u1", ts(3)), ("u3", ts(4)))   // u1 is a replay
    query.processAllAvailable()
    query.stop()
    val keys = spark.table("dedup_out").collect()
      .map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("u1", "u2", "u3"))
  }

  test("tumbling with watermark emits closed windows matching the " +
    "batch aggregation") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val query = Streams.tumbling(df, "ts", "event_type", "value",
        width = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()

    stream.addData((ts(0), "view", 1.0), (ts(10), "view", 2.0),
      (ts(20), "click", 5.0))
    query.processAllAvailable()
    // advance watermark far past the first window's end
    stream.addData((ts(600), "view", 9.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("tumbling_out")
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("cnt"),
        r.getAs[Double]("sum_value")))
    // only the first (closed) window is emitted; the ts(600) window is
    // still open
    assert(rows.toSeq == Seq(("click", 1L, 5.0), ("view", 2L, 3.0)))
  }

  test("intervalJoin attributes clicks to purchases within the " +
    "lookback window only") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, String)]
    val out = graft.streaming.Streams.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      purchases.toDF().toDF("user_id", "ts", "purchase_id"),
      "user_id", "ts", lookback = "1 hour")
    val query = out.select(col("purchase_id"), col("click_id"))
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    clicks.addData((1L, ts(0), "c-old"), (1L, ts(90), "c-in"),
      (2L, ts(95), "c-other-user"))
    purchases.addData((1L, ts(120), "p1"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("attrib_out").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // c-in (30min before p1, same user) attributes; c-old (2h before)
    // is outside the lookback; c-other-user has the wrong key
    assert(rows == Set(("p1", "c-in")))
  }

  test("intervalJoinRightOuter emits an unmatched purchase exactly " +
    "once with NULL click columns after the watermark passes its " +
    "window; matched pairs emit like the inner arm") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val purchases = MemoryStream[(Long, Timestamp, String)]
    val out = graft.streaming.Streams.intervalJoinRightOuter(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      purchases.toDF().toDF("user_id", "ts", "purchase_id"),
      "user_id", "ts", lookback = "1 hour", watermark = "2 hours")
    val query = out.select(col("purchase_id"), col("click_id"))
      .writeStream.format("memory").queryName("rojoin_out")
      .outputMode("append").start()
    clicks.addData((1L, ts(90), "c-in"))
    purchases.addData((1L, ts(120), "p-matched"),
      (2L, ts(120), "p-orphan"))
    query.processAllAvailable()
    // advance both watermarks far past p-orphan's window so its
    // right-side state provably cannot match and must flush
    clicks.addData((9L, ts(3000), "c-late"))
    purchases.addData((9L, ts(3000), "p-late"))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("rojoin_out").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows.contains(("p-matched", Some("c-in"))))
    assert(rows.contains(("p-orphan", None)),
      s"unmatched purchase did not flush: $rows")
    assert(rows.count(_._1 == "p-orphan") == 1)
  }

  test("sessionize closes a session when the gap is exceeded, matching " +
    "batch sessionStats counts") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val query = Streams.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()

    stream.addData(SessionEvent(1L, ts(0), 100L),
      SessionEvent(1L, ts(10), 101L), SessionEvent(2L, ts(5), 200L))
    query.processAllAvailable()
    // user 1 comes back 2h later → first session closes on arrival
    stream.addData(SessionEvent(1L, ts(130), 102L))
    query.processAllAvailable()
    query.stop()

    // two close paths fire: user 1's session closes on arrival of the
    // out-of-gap event; user 2's closes via EventTimeTimeout once the
    // watermark (ts(130) − 30min) passes its deadline (ts(5) + 30min)
    val closed = spark.table("sessions_out").as[ClosedSession].collect()
      .sortBy(_.user_id)
    assert(closed.toSeq == Seq(
      ClosedSession(1L, ts(0), ts(10), 2L),
      ClosedSession(2L, ts(5), ts(5), 1L)))

    // batch twin agrees: user 1 has 2 sessions of sizes (2, 1)
    val batch = graft.operators.Events.sessionStats(
      Seq((1L, ts(0), 100L), (1L, ts(10), 101L), (1L, ts(130), 102L))
        .toDF("user_id", "ts", "event_id"),
      "ts", "user_id", "event_id", 30).collect()
    val u1 = batch.find(_.getLong(0) == 1L).get
    assert(u1.getAs[Long]("session_cnt") == 2L &&
      u1.getAs[Long]("max_session_events") == 2L)
  }

  test("curation stages run unchanged on a stream and match the batch " +
    "twin") {
    implicit val sc = spark.sqlContext
    // stateless scan-side stages (quality gate, split, scrub, tokens)
    // need no watermark and no state — the streaming plan is the batch
    // plan per micro-batch, so the outputs must agree row-for-row
    val rows = Seq(
      (1L, "the quick brown fox jumps over a lazy dog of the town"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "mail me at a@b.io and visit the site now"))
    def stage(df: org.apache.spark.sql.DataFrame) =
      df.filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.2)
        .select(col("doc_id"),
          graft.operators.Curation.hashSplit(col("text")).as("split"),
          graft.operators.Curation.scrubPii(col("text")).as("clean"),
          graft.operators.TextAnalysis.wsTokenCount(col("text")).as("tokens"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(rows: _*)
    val q = stage(stream.toDF().select(col("_1").as("doc_id"),
        col("_2").as("text")))
      .writeStream.format("memory").queryName("curated_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("curated_stream").orderBy("doc_id").collect()
    val batch = stage(rows.toDF("doc_id", "text")).orderBy("doc_id").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.exists(_.getAs[String]("clean").contains("[EMAIL]")))
  }
}
