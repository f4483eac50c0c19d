package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable HLL distinct-count sketches: slice-and-merge equals
  * whole-scan, estimates track exact counts, rollups read bytes not
  * rows.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val events = spark.read
    .option("mergeSchema", "false")
    .parquet("/root/testdata/sf0.01/events.parquet")

  test("merged slice sketches estimate == whole-scan sketch estimate " +
    "(associative build), and both track the exact distinct count") {
    val df = events.select($"event_type", $"user_id",
      (xxhash64($"event_id") % 4).as("slice"))
    // build per (event_type, slice) — the incremental ingest shape
    val slices = Sketches.sketchTable(df,
      Seq("event_type", "slice"), "user_id")
    val merged = Sketches.mergeEstimate(slices, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // whole-scan sketch per event_type
    val whole = Sketches.sketchTable(df, Seq("event_type"), "user_id")
    val wholeEst = Sketches.mergeEstimate(whole, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == wholeEst,
      "slice-merged estimates differ from whole-scan estimates")
    // estimates within 5% of exact
    val exact = df.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (et, n) =>
      val est = merged(et)
      assert(math.abs(est - n) <= math.max(2L, (n * 0.05).toLong),
        s"$et: est $est vs exact $n")
    }
  }

  test("estimateAll merges across all groups without rescanning") {
    val df = events.select($"event_type", $"user_id")
    val slices = Sketches.sketchTable(df, Seq("event_type"), "user_id")
    val est = Sketches.estimateAll(slices).head.getLong(0)
    val exact = df.agg(countDistinct($"user_id")).head.getLong(0)
    assert(math.abs(est - exact) <= math.max(2L, (exact * 0.05).toLong),
      s"global est $est vs exact $exact")
  }

  test("CMS: slice-merge ≡ whole-scan estimates; every estimate " +
    "within the published [exact, exact + ε·N] band") {
    val df = events.select($"event_type",
      concat(lit("u"), $"user_id" % 97).as("item"))
    val eps = 0.001
    val sliced = Sketches.cmsTable(df, Seq("event_type"), "item", eps = eps)
    val whole = Sketches.cmsTable(df.withColumn("g", lit(1)),
      Seq("g"), "item", eps = eps)
    val items = (0 until 97).map(i => s"u$i")
    val fromSlices = Sketches.cmsEstimate(sliced, items)
    val fromWhole = Sketches.cmsEstimate(whole, items)
    assert(fromSlices == fromWhole,
      "slice-merged counters must equal the whole-scan sketch")
    val exact = df.groupBy($"item").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val slack = math.ceil(eps * n).toLong
    items.foreach { it =>
      val (e, ex) = (fromSlices(it), exact.getOrElse(it, 0L))
      assert(e >= ex && e <= ex + slack, s"$it: est $e vs exact $ex")
    }
    // an item never added estimates within ε·N of zero (may collide)
    assert(fromSlices.getOrElse("u96", 0L) >= 0L)
  }
}
