package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg

/** Additive IVM: incremental ≡ full recompute, exactly-once replays,
  * batch provenance committed atomically with the data.
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def rollup(path: String) =
    spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("three delta refreshes equal the one-shot full aggregate") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm")
    val path = tmp.resolve("r").toString
    val all = (0 until 900).map(i => (s"k${i % 7}", i.toLong)).toDF("k", "v")
    Seq(0 -> 300, 300 -> 600, 600 -> 900).zipWithIndex.foreach {
      case ((a, b), i) =>
        val applied = IncrementalAgg.refreshAdditive(spark, path,
          all.filter($"v" >= a && $"v" < b), Seq("k"), Seq("v"), s"b$i")
        assert(applied)
    }
    val full = all.groupBy($"k")
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rollup(path) == full)
    assert(IncrementalAgg.appliedBatches(spark, path) == Seq("b0", "b1", "b2"))
  }

  test("replaying an applied batch is a no-op (at-least-once callers " +
    "get exactly-once rollups)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm2")
    val path = tmp.resolve("r").toString
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    assert(IncrementalAgg.refreshAdditive(spark, path, d,
      Seq("k"), Seq("v"), "batch-1"))
    val once = rollup(path)
    assert(!IncrementalAgg.refreshAdditive(spark, path, d,
      Seq("k"), Seq("v"), "batch-1"))
    assert(rollup(path) == once)
    assert(once == Set(("a", 2L, 3L), ("b", 1L, 3L)))
  }

  test("batch list lives inside the table dir and survives the swap " +
    "— no stray staging dirs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm3")
    val path = tmp.resolve("r").toString
    val d = Seq(("x", 5L)).toDF("k", "v")
    IncrementalAgg.refreshAdditive(spark, path, d, Seq("k"), Seq("v"), "b0")
    IncrementalAgg.refreshAdditive(spark, path, d, Seq("k"), Seq("v"), "b1")
    assert(new java.io.File(path, "_graft_batches").exists())
    assert(!new java.io.File(path + "__tmp").exists())
    assert(!new java.io.File(path + "__old").exists())
    assert(rollup(path) == Set(("x", 2L, 10L)))
  }

  test("crash between the swap renames: the backup is restored, not " +
    "clobbered — prior rollup and provenance survive") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivm4")
    val path = tmp.resolve("r").toString
    val d1 = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val d2 = Seq(("a", 10L)).toDF("k", "v")
    assert(IncrementalAgg.refreshAdditive(spark, path, d1,
      Seq("k"), Seq("v"), "b1"))
    // simulate the crash window: live renamed to __old, tmp (the
    // half-applied b2) written, swap-in never happened
    val live = new java.io.File(path)
    assert(live.renameTo(new java.io.File(path + "__old")))
    d2.groupBy($"k").agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
      .write.parquet(path + "__tmp")
    // the retry must NOT see "no table" — it restores b1's rollup and
    // re-applies b2 on top
    assert(IncrementalAgg.refreshAdditive(spark, path, d2,
      Seq("k"), Seq("v"), "b2"))
    assert(rollup(path) == Set(("a", 2L, 11L), ("b", 1L, 2L)))
    assert(IncrementalAgg.appliedBatches(spark, path) == Seq("b1", "b2"))
  }
}
