package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest entry point: the reference pipeline's first dataflow ops
  * re-expressed Spark-first.
  *
  * - S1 JSON config scan (rss_feeds.py:9-15): one nested
  *   source→topic→url JSON object, read `wholetext` and parsed with an
  *   explicit MapType schema (`spark.read.json` would infer a struct
  *   with one field per source name — a map is the right shape for
  *   config whose keys are data).
  * - G1 two-level map explode (raw_articles.py:72-76): map →
  *   (source, topic, url) rows.
  * - G2 feed-entry explode (raw_articles.py:89-90): one feed → N entry
  *   rows, capped per feed (P13, raw_articles.py:69).
  *
  * Scale shape: the config is tiny (dims), so everything here stays a
  * narrow broadcast-able frame; the expensive side (articles) only ever
  * meets it through broadcast joins.
  */
object Ingest {

  /** S1+G1: read the nested feed-config JSON and explode to one row per
    * (source, topic, url).
    */
  def feedConfig(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(from_json(col("value"),
        org.apache.spark.sql.types.DataType.fromDDL(
          "map<string,map<string,string>>"),
        Map.empty[String, String]).as("m"))
      .select(explode(col("m")).as(Seq("source", "topics")))
      .select(col("source"), explode(col("topics")).as(Seq("topic", "url")))

  /** G2+P13: explode each feed row into `perFeed` synthetic entries
    * (deterministic stand-in for the offline-unavailable RSS fetch S2 —
    * the *explode + cap* dataflow is the operator under test), keeping
    * only the first `cap` per feed.
    */
  def explodeEntries(feeds: DataFrame, perFeed: Int, cap: Int): DataFrame = {
    // sequence(1, 0) yields a DESCENDING [1, 0], not an empty array —
    // perFeed=0 must mean zero entries, not two phantom ones
    val entryNos =
      if (perFeed <= 0) array().cast("array<int>")
      else sequence(lit(1), lit(perFeed))
    feeds
      .select(col("source"), col("topic"), col("url"),
        explode(entryNos).as("entry_no"))
      .filter(col("entry_no") <= cap)
      .withColumn("link", concat(col("url"), lit("?item="), col("entry_no")))
  }
}
