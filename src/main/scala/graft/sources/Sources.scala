package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ingest

/** A named, swappable raw-content fetch stage — the source-side twin
  * of [[graft.functions.ColumnPlugins]]. The reference fetches feeds
  * over HTTP (feedparser in raw_articles.py:84-90); this zero-egress
  * engine ships offline stand-ins. The contract makes the swap-in
  * explicit: a live deployment registers a plugin under the same name
  * (e.g. an HTTP fetcher doing `mapPartitions` with one pooled client
  * per partition — never a per-row connection) and the ingest queries
  * pick it up unchanged.
  *
  * `fetch` takes the feed-config frame — `(source, topic, url)` rows,
  * a dim by contract (SURVEY §2.1: config is data, but *small* data) —
  * and returns it with a `content` column holding the raw fetched
  * document. Implementations must keep the feed side broadcast-able
  * and must not collect it to the driver.
  */
trait SourcePlugin {
  /** Registry key; later registrations under the same name win. */
  def name: String
  /** Add a `content` column with the fetched raw document per feed. */
  def fetch(spark: SparkSession, feeds: DataFrame): DataFrame
}

/** Fetch stand-in that resolves each feed `url` against the files of a
  * local directory tree: the tree is scanned wholetext with lineage
  * (`input_file_name`), and the tiny feed frame broadcast-joins on a
  * path-suffix match. No driver collect, no per-row file open — the
  * scan parallelizes over files like any other source, so the same
  * shape holds for an object-store "directory" at cluster scale.
  */
final case class FileTreeSource(base: String, name: String = "filetree")
    extends SourcePlugin {
  override def fetch(spark: SparkSession, feeds: DataFrame): DataFrame = {
    val docs = spark.read.option("wholetext", "true").text(s"$base/*")
      .select(col("value").as("content"), input_file_name().as("_path"))
    docs.join(broadcast(feeds), col("_path").endsWith(col("url")))
      .drop("_path")
  }
}

/** Deterministic synthetic-entry stand-in (the q35/q05 shape): each
  * feed yields `perFeed` entries via [[Ingest.explodeEntries]], and
  * `content` is a minimal one-item XML document per entry so the q50
  * parse chain runs end-to-end against it.
  */
final case class SyntheticFeedSource(perFeed: Int = 3, cap: Int = 3,
    name: String = "synthetic") extends SourcePlugin {
  override def fetch(spark: SparkSession, feeds: DataFrame): DataFrame =
    Ingest.explodeEntries(feeds, perFeed, cap)
      .groupBy(col("source"), col("topic"), col("url"))
      .agg(concat(lit("<rss>"),
        concat_ws("", collect_list(concat(
          lit("<item><link>"), col("link"),
          lit("</link><title>"), col("topic"),
          lit(" #"), col("entry_no"),
          lit("</title></item>")))),
        lit("</rss>")).as("content"))
}

/** Process-wide source registry. [[SyntheticFeedSource]] is registered
  * as the default `feed` source; point `feed` at a [[FileTreeSource]]
  * (or a live HTTP plugin) to change where every ingest query reads
  * from without touching query code.
  */
object Sources {

  private val registry = new ConcurrentHashMap[String, SourcePlugin]()

  def register(p: SourcePlugin): Unit = registry.put(p.name, p)

  def apply(name: String): SourcePlugin = {
    val p = registry.get(name)
    if (p == null) throw new NoSuchElementException(
      s"no SourcePlugin '$name' registered; have: ${names.mkString(", ")}")
    p
  }

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }

  register(SyntheticFeedSource(name = "feed"))
  register(SyntheticFeedSource())
}
