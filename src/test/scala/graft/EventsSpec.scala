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

  test("bandJoin: equals the cross-join filter, including boundary " +
    "pairs, and plans with no nested-loop join") {
    val rnd = new scala.util.Random(17)
    val a = (0 until 300).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("id", "v")
    val b = (1000 until 1300).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("id", "v")
    // include exact-boundary values on both sides
    val a2 = a.union(Seq((900L, 50.0)).toDF("id", "v"))
    val b2 = b.union(Seq((1900L, 50.25), (1901L, 49.75)).toDF("id", "v"))
    val eps = 0.25
    val banded = graft.operators.Events.bandJoin(a2, b2, "v", "v", eps)
      .select("l_id", "r_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = a2.as("x").crossJoin(b2.as("y"))
      .filter(abs(col("x.v") - col("y.v")) <= eps)
      .select(col("x.id"), col("y.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
    assert(banded.contains((900L, 1900L)) && banded.contains((900L, 1901L)))
    // the whole point: no BroadcastNestedLoopJoin / Cartesian in the plan
    val plan = graft.operators.Events.bandJoin(a2, b2, "v", "v", eps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(400))
  }

  test("rateLimit: window formulation equals the sequential fold, " +
    "gaps enforced, never admits early") {
    val base = 1700000000000000L // epoch micros
    // bursts, exact-gap arrivals, and quiet stretches per key
    val reqs = Seq(
      ("a", 1L, 0L), ("a", 2L, 100000L), ("a", 3L, 200000L), // burst
      ("a", 4L, 5000000L),                                   // idle gap
      ("b", 5L, 0L), ("b", 6L, 1000000L),                    // exactly 1s
      ("b", 7L, 1500000L))
      .map { case (k, id, off) => (k, id, new java.sql.Timestamp(
        (base + off) / 1000L)) }
      .toDF("k", "id", "ts")
    val gap = 1000000L
    val out = graft.operators.Events
      .rateLimit(reqs, "k", "ts", gap, col("id"))
      .select(col("k"), col("id"), unix_micros(col("admit_ts")).as("a"),
        unix_micros(col("ts")).as("t"), col("wait_us"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // reference: per-key sequential fold of the recurrence
    val expected = out.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var prev = Long.MinValue
      rows.toSeq.sortBy(r => (r._4, r._2)).map { r =>
        val admit = math.max(r._4, if (prev == Long.MinValue) r._4
          else prev + gap)
        prev = admit
        (r._1, r._2) -> admit
      }
    }.toMap
    out.foreach { r =>
      assert(r._3 == expected((r._1, r._2)),
        s"${r._1}/${r._2}: admit ${r._3} != fold ${expected((r._1, r._2))}")
      assert(r._3 >= r._4 && r._5 == r._3 - r._4)
    }
    // enforced spacing within each key
    out.groupBy(_._1).foreach { case (_, rows) =>
      val admits = rows.map(_._3).toSeq.sorted
      admits.zip(admits.drop(1)).foreach { case (x, y) =>
        assert(y - x >= gap)
      }
    }
  }

  test("rateLimit property: random arrival patterns always equal the " +
    "sequential fold") {
    val gen = org.scalacheck.Gen.listOfN(40,
      org.scalacheck.Gen.choose(0L, 20000000L))
    (0 until 5).foreach { trial =>
      val offs = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(31L + trial)).get
      val base = 1700000000000000L
      val reqs = offs.zipWithIndex.map { case (off, i) =>
        (s"k${i % 3}", i.toLong,
          new java.sql.Timestamp((base + off) / 1000L))
      }.toDF("k", "id", "ts")
      val gap = 777000L
      val out = graft.operators.Events.rateLimit(reqs, "k", "ts", gap,
          col("id"))
        .select(col("k"), col("id"), unix_micros(col("admit_ts")),
          unix_micros(col("ts")))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      out.groupBy(_._1).foreach { case (_, rows) =>
        var prev = Long.MinValue
        rows.toSeq.sortBy(r => (r._4, r._2)).foreach { r =>
          val admit = if (prev == Long.MinValue) r._4
            else math.max(r._4, prev + gap)
          assert(r._3 == admit, s"trial $trial ${r._1}/${r._2}")
          prev = admit
        }
      }
    }
  }

  test("bandJoin property: random data always equals the cross-join " +
    "filter") {
    val gen = org.scalacheck.Gen.listOfN(120,
      org.scalacheck.Gen.choose(0.0, 50.0))
    (0 until 5).foreach { trial =>
      val vs = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(101L + trial)).get
      val (av, bv) = vs.splitAt(60)
      val a = av.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val b = bv.zipWithIndex.map { case (v, i) => (1000L + i, v) }
        .toDF("id", "v")
      val eps = 0.3 + trial * 0.2
      val banded = graft.operators.Events.bandJoin(a, b, "v", "v", eps)
        .select("l_id", "r_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = a.as("x").crossJoin(b.as("y"))
        .filter(abs(col("x.v") - col("y.v")) <= eps)
        .select(col("x.id"), col("y.id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == exact, s"trial $trial eps $eps")
    }
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
