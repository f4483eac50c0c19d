package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Smoke test over the REAL driver-generated testdata, not synthetic
  * fixtures. The driver has regenerated /root/testdata with different
  * parquet timestamp physical types across rounds (INT64 TIMESTAMP(NANOS)
  * → plain timestamp[us] with no UTC adjustment, which Spark 4 infers as
  * TIMESTAMP_NTZ). Queries.t must normalize whatever format is on disk to
  * µs TimestampType so that unix_micros(), window(), and typed
  * java.sql.Timestamp encoders all work. This spec reads the actual
  * files so a future regeneration breaks a test run, not a round.
  */
class TestdataSmokeSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean = new java.io.File(s"$sfDir/events.parquet").exists

  test("events.ts normalizes to TimestampType regardless of parquet physical type") {
    assume(available)
    val s = SharedSpark.spark
    val ev = graft.queries.Queries.t(s, sfDir, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${ev.schema("ts").dataType}")
    // unix_micros rejects TIMESTAMP_NTZ — this evaluates only if the
    // normalization happened.
    val micros = ev.select(unix_micros(col("ts")).as("us")).agg(min("us"), max("us")).head()
    assert(!micros.isNullAt(0) && micros.getLong(0) > 0L)
    assert(micros.getLong(1) >= micros.getLong(0))
  }

  test("typed java.sql.Timestamp round-trip over real events") {
    assume(available)
    val s = SharedSpark.spark
    import s.implicits._
    val ev = graft.queries.Queries.t(s, sfDir, "events")
    // The streaming queries (q100/q107) encode rows as java.sql.Timestamp;
    // a TIMESTAMP_NTZ column would ClassCast (LocalDateTime) here.
    val rows = ev.select($"event_id", $"ts")
      .as[(Long, java.sql.Timestamp)]
      .take(5)
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 != null))
    // driver-side Row.getTimestamp (used by q100/q107/q111 slicing)
    val mm = ev.agg(min($"ts"), max($"ts")).head()
    val (lo, hi) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    assert(hi >= lo && lo > 0L)
  }

  test("all tables at sf0.001 load through Queries.t with no NTZ columns") {
    assume(available)
    val s = SharedSpark.spark
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val df = graft.queries.Queries.t(s, sfDir, name)
      val ntz = df.schema.fields.filter(
        _.dataType == org.apache.spark.sql.types.TimestampNTZType)
      assert(ntz.isEmpty, s"$name still has NTZ columns: ${ntz.map(_.name).mkString(",")}")
      assert(df.limit(1).count() == 1, s"$name unreadable or empty")
    }
  }
}
