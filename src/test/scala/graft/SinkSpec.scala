package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** Sink family (SURVEY.md §2.2): K1 raw-zone JSON, K3 replace
  * (overwrite), K5 vector upsert, K7 warehouse parquet layout.
  */
class SinkSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("K1: raw-zone JSON sink round-trips run-scoped records") {
    val dir = s"${tmp()}/raw_data/src0/run1/extract"
    Seq((1L, "alpha", "https://a.example.com"),
      (2L, "beta", "https://b.example.com"))
      .toDF("id", "title", "url")
      .write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.filter($"id" === 1L).head.getAs[String]("title") == "alpha")
  }

  test("K3: replace sink overwrites the whole table") {
    val dir = s"${tmp()}/rss_feed_list"
    Seq(("old", 1)).toDF("name", "v").write.mode("overwrite").parquet(dir)
    Seq(("new-a", 2), ("new-b", 3)).toDF("name", "v")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("name").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("new-a", "new-b"))
  }

  test("K5: vector upsert replaces the embedding for an existing point " +
    "and inserts new points, leaving payload columns intact") {
    val base = Seq(
      ("p1", Array(1f, 0f), "topicA"),
      ("p2", Array(0f, 1f), "topicB")
    ).toDF("point_id", "embedding", "topic_id")
    val delta = Seq(
      ("p2", Array(0.5f, 0.5f), null: String),  // re-embed p2, keep topic
      ("p3", Array(1f, 1f), "topicC")           // new point
    ).toDF("point_id", "embedding", "topic_id")
    val merged = Upsert.merge(base, delta, Seq("point_id"), patch = true)
      .orderBy("point_id").collect()
    assert(merged.length == 3)
    assert(merged(1).getSeq[Float](1) == Seq(0.5f, 0.5f)) // p2 replaced
    assert(merged(1).getString(2) == "topicB")            // payload kept
    assert(merged(2).getString(0) == "p3")
  }

  test("K8: SinkPlugin registry resolves by name; FileTreeSink uploads " +
    "blobs partition-wise and returns receipts") {
    import graft.sources.{FileTreeSink, Sinks}
    val dir = s"${tmp()}/blobsink"
    Sinks.register(FileTreeSink(base = dir, name = "spec-blob"))
    val blobs = Seq(
      ("a1", "hello".getBytes("UTF-8")),
      ("a2", Array[Byte](0, 1, 2, 3))
    ).toDF("audio_id", "audio")
    val receipts = Sinks("spec-blob").upload(blobs, "audio_id", "audio")
      .orderBy("key").collect()
    assert(receipts.map(_.getString(0)).toSeq == Seq("a1", "a2"))
    // the blobs actually landed, byte-identical
    val a1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a1.bin"))
    assert(new String(a1, "UTF-8") == "hello")
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a2.bin")).toSeq == Seq[Byte](0, 1, 2, 3))
    // receipts point at the landed files
    assert(receipts.forall(r => r.getString(1).endsWith(s"${r.getString(0)}.bin")))
    // re-upload is idempotent (task-retry safety)
    Sinks("spec-blob").upload(blobs, "audio_id", "audio").collect()
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/a1.bin")), "UTF-8") == "hello")
    // unknown names fail with the available set, like Sources
    val e = intercept[NoSuchElementException](Sinks("nope"))
    assert(e.getMessage.contains("spec-blob"))
    // hostile keys cannot escape the base dir (percent-encoded)
    val hostile = Seq(("../escape", Array[Byte](7)))
      .toDF("audio_id", "audio")
    val rec = Sinks("spec-blob").upload(hostile, "audio_id", "audio")
      .head.getString(1)
    assert(new java.io.File(rec).getCanonicalPath
      .startsWith(new java.io.File(dir).getCanonicalPath), rec)
    assert(!new java.io.File(s"$dir/../escape.bin").exists())
  }

  test("K7: warehouse sink writes lang-partitioned parquet that prunes") {
    val dir = s"${tmp()}/warehouse/documents"
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("doc_id", "lang")
      .write.partitionBy("lang").parquet(dir)
    assert(new java.io.File(s"$dir/lang=en").exists())
    val scan = spark.read.parquet(dir).filter($"lang" === "en")
    assert(scan.count() == 2)
    // partition pruning: the physical scan's read path carries the
    // partition filter, not a post-scan filter over all rows
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || scan.inputFiles.length == 1)
  }

  test("K7-ORC: the ORC warehouse twin prunes partitions AND pushes " +
    "row filters into the scan, like the parquet form") {
    val dir = s"${tmp()}/warehouse_orc/lineitem"
    Seq((1L, 10.0, "R"), (2L, 40.0, "R"), (3L, 40.0, "N"))
      .toDF("k", "qty", "flag")
      .write.partitionBy("flag").format("orc").save(dir)
    assert(new java.io.File(s"$dir/flag=R").exists())
    val scan = spark.read.format("orc").load(dir)
      .filter($"flag" === "R" && $"qty" >= 30.0)
    assert(scan.select($"k").as[Long].collect().toSeq == Seq(2L))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") ||
      scan.inputFiles.forall(_.contains("flag=R")))
    assert(plan.contains("PushedFilters"), plan)
  }
}
