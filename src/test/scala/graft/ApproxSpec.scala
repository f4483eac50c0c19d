package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates: at 100 TB, exact distinct
  * counts and percentiles shuffle every distinct value; the HLL /
  * quantile-sketch forms shuffle constant-size sketches. Accuracy is
  * asserted against the exact forms on real testdata.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val events =
    spark.read.parquet("/root/testdata/sf0.01/events.parquet")

  test("approx_count_distinct within 5% of exact") {
    val exact = events.select(countDistinct($"user_id")).head.getLong(0)
    val approx = events.select(approx_count_distinct($"user_id", 0.02))
      .head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val exact = events.select(median($"value")).head.getDouble(0)
    val approx = events
      .select(percentile_approx($"value", lit(0.5), lit(1000)))
      .head.getDouble(0)
    // sketch answer must be a real sample near the exact median
    val spread = events.select(stddev($"value")).head.getDouble(0)
    assert(math.abs(approx - exact) < spread * 0.1,
      s"approx=$approx exact=$exact")
  }
}
