package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Events

/** Event-time operators: windows, sessions, as-of join, staleness. */
class EventsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows bucket by the hour") {
    val df = Seq(
      (ts("2024-01-01 10:05:00"), "a", 1.0),
      (ts("2024-01-01 10:55:00"), "a", 2.0),
      (ts("2024-01-01 11:05:00"), "a", 4.0)
    ).toDF("ts", "k", "v")
    val out = Events.tumbling(df, "ts", "k", "v").orderBy("window_start")
      .collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("cnt") == 2 &&
      out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Double]("sum_value") == 4.0)
  }

  test("sliding windows assign each event to two 1h/30m windows") {
    val df = Seq((ts("2024-01-01 10:40:00"), "a", 1.0)).toDF("ts", "k", "v")
    val out = Events.sliding(df, "ts", "k", "v").orderBy("window_start")
      .collect()
    assert(out.map(_.getTimestamp(0).toString).toSeq ==
      Seq("2024-01-01 10:00:00.0", "2024-01-01 10:30:00.0"))
  }

  test("sessionStats: 30-min gap splits sessions") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L), // same session
      (1L, ts("2024-01-01 11:00:00"), 3L), // 50-min gap → new session
      (2L, ts("2024-01-01 09:00:00"), 4L)
    ).toDF("user_id", "ts", "event_id")
    val out = Events.sessionStats(df, "ts", "user_id", "event_id", 30)
      .orderBy("user_id").collect()
    assert(out(0).getAs[Long]("session_cnt") == 2)
    assert(out(0).getAs[Long]("max_session_events") == 2)
    assert(out(0).getAs[Long]("total_events") == 3)
    assert(out(1).getAs[Long]("session_cnt") == 1)
  }

  test("asofJoin picks most recent right row at-or-before left ts") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 10:00:00"))  // no click for user 2
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 1L, ts("2024-01-01 09:30:00")),
      (101L, 1L, ts("2024-01-01 10:00:00")), // ties left(10) → match (<=)
      (102L, 1L, ts("2024-01-01 11:59:00")),
      (103L, 3L, ts("2024-01-01 08:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Events.asofJoin(left, right, "user_id", "ts", "event_id")
      .orderBy("event_id").collect()
    assert(out(0).getAs[Long]("asof_id") == 101L) // <= semantics
    assert(out(1).getAs[Long]("asof_id") == 102L)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_id"))) // left join: null
  }

  test("staleRows keeps rows older than max(ts) - N days") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-05 00:00:00")),
      (3L, ts("2024-01-10 00:00:00"))
    ).toDF("id", "ts")
    val out = Events.staleRows(df, "ts", 7).select("id").collect()
      .map(_.getLong(0)).toSet
    assert(out == Set(1L)) // cut = Jan 3
  }
}
