package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Expectations

/** Data-quality gates: NOT-TRUE violation semantics (false and null
  * both count), unique-key duplicate counting, hand-verified counts
  * on a dirty fixture, and the one-scan plan shape for the
  * row-predicate battery.
  */
class ExpectationsSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def dirty = Seq[(java.lang.Long, String, java.lang.Long)](
    (1L, "en", 10L), (2L, "en", -3L), (3L, null, 5L),
    (3L, "de", null), (4L, "zz", 7L), (null, "en", 1L))
    .toDF("id", "lang", "n")

  test("row predicates count false AND null as violations; unique " +
    "keys count every duplicated row") {
    val report = Expectations.check(dirty,
      Seq(
        "id_nonnull" -> $"id".isNotNull,       // 1 null id
        "n_nonneg" -> ($"n" >= 0L),            // -3 and the null n
        "lang_known" -> $"lang".isin("en", "de")), // null + 'zz'
      uniqueKeys = Seq("id_unique" -> Seq("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(report("id_nonnull") == ((1L, false)))
    assert(report("n_nonneg") == ((2L, false)))
    assert(report("lang_known") == ((2L, false)))
    // id=3 appears twice: BOTH rows are in violation of uniqueness
    assert(report("id_unique") == ((2L, false)))
  }

  test("a clean table passes everything, n_rows rides along") {
    val clean = Seq((1L, "en"), (2L, "de")).toDF("id", "lang")
    val rows = Expectations.check(clean,
      Seq("id_nonnull" -> $"id".isNotNull),
      uniqueKeys = Seq("id_unique" -> Seq("id"))).collect()
    assert(rows.forall(_.getBoolean(3)))
    assert(rows.forall(_.getLong(1) == 2L))
  }

  test("the row-predicate battery is ONE scan: a single pair of " +
    "hash aggregates, no join, no per-expectation re-read") {
    val p = Expectations.check(dirty, Seq(
        "a" -> $"id".isNotNull, "b" -> ($"n" >= 0L),
        "c" -> $"lang".isNotNull))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    val scans = p.sliding("LocalTableScan".length)
      .count(_ == "LocalTableScan")
    assert(scans == 1, s"expected one scan, got $scans\n$p")
  }
}
