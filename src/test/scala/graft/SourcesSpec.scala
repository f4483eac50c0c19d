package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileTreeSource, SourcePlugin, Sources}

/** The fetch seam: ingest resolves its raw-content source by name, so
  * swapping the offline stand-in for a live fetcher is a registration,
  * not a query change.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def feeds: DataFrame = {
    import spark.implicits._
    Seq(("tin", "sport", "feed_sample.xml")).toDF("source", "topic", "url")
  }

  // the q50 item-parse chain, over whatever content a source fetched
  private def parseItems(raw: DataFrame): DataFrame =
    raw.select(col("source"), col("topic"),
        explode(split(col("content"), "<item>")).as("x"))
      .filter(col("x").contains("</item>"))
      .select(col("source"),
        regexp_extract(col("x"), "<link>([^<]*)</link>", 1).as("link"))

  test("filetree source fetches by path suffix with no driver collect") {
    val src = FileTreeSource("/root/repo/fixtures")
    val items = parseItems(src.fetch(spark, feeds))
    // feed_sample.xml carries the 4 items q50 asserts against
    assert(items.count() == 4)
    assert(items.select("link").as[String](spark.implicits.newStringEncoder)
      .collect().forall(_.nonEmpty))
  }

  test("default synthetic feed source drives the same parse chain") {
    val items = parseItems(Sources("feed").fetch(spark, feeds))
    assert(items.count() == 3) // perFeed = 3 entries per feed
  }

  test("a swapped-in plugin replaces the fetch stage by name") {
    Sources.register(new SourcePlugin {
      def name = "feed" // same name as the default: swap-in, not add
      def fetch(s: SparkSession, f: DataFrame): DataFrame =
        f.withColumn("content",
          lit("<rss><item><link>http://live/1</link></item></rss>"))
    })
    try {
      val items = parseItems(Sources("feed").fetch(spark, feeds))
      assert(items.count() == 1)
      assert(items.head.getString(1) == "http://live/1")
    } finally Sources.register(graft.sources.SyntheticFeedSource(name = "feed"))
  }

  test("unknown source names fail with the available list") {
    val err = intercept[NoSuchElementException](Sources("nope"))
    assert(err.getMessage.contains("no SourcePlugin 'nope'"))
  }
}
