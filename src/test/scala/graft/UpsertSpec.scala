package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Upsert

/** K2/K4 merge semantics: replace-row vs $set patch, idempotency,
  * schema-accretion (SURVEY.md §1.3 "dynamic accretion").
  */
class UpsertSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def base = Seq(
    ("u1", "t1", Some(5)),
    ("u2", "t2", Some(7)),
    ("u3", "t3", None)
  ).toDF("url", "title", "score")

  test("replace-row merge: delta row wins entirely, nulls included") {
    val delta = Seq(("u2", "t2x", None: Option[Int]),
      ("u4", "t4", Some(1))).toDF("url", "title", "score")
    val out = Upsert.merge(base, delta, Seq("url"))
      .orderBy("url").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("u1", "u2", "u3", "u4"))
    val u2 = out(1)
    assert(u2.getString(1) == "t2x" && u2.isNullAt(2)) // replaced, null wins
    assert(out(3).getString(1) == "t4")
  }

  test("patch merge: delta nulls preserve base values ($set)") {
    val delta = Seq(("u2", null.asInstanceOf[String], Some(9)))
      .toDF("url", "title", "score")
    val out = Upsert.merge(base, delta, Seq("url"), patch = true)
      .orderBy("url").collect()
    val u2 = out(1)
    assert(u2.getString(1) == "t2")  // null in delta → base kept
    assert(u2.getInt(2) == 9)        // patched
    assert(out(0).getString(1) == "t1") // untouched row intact
  }

  test("merge is idempotent: applying the same delta twice is a no-op") {
    val delta = Seq(("u1", "t1b", Some(6))).toDF("url", "title", "score")
    val once = Upsert.merge(base, delta, Seq("url"))
    val twice = Upsert.merge(once, delta, Seq("url"))
    assert(once.orderBy("url").collect().toSeq ==
      twice.orderBy("url").collect().toSeq)
  }

  test("schema accretion: delta-only columns are added, null elsewhere") {
    val delta = Seq(("u1", "completed")).toDF("url", "embedding_status")
    val out = Upsert.merge(base, delta, Seq("url"), patch = true)
    assert(out.columns.toSeq ==
      Seq("url", "title", "score", "embedding_status"))
    val m = out.orderBy("url").collect()
    assert(m(0).getString(3) == "completed")
    assert(m(1).isNullAt(3))
    // base columns survive the accretion untouched
    assert(m(1).getString(1) == "t2" && m(1).getInt(2) == 7)
  }

  test("mergeIntoTable round-trips through parquet atomically") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val path = s"$dir/articles"
    Upsert.mergeIntoTable(spark, path, base, Seq("url"))
    val delta = Seq(("u3", "t3x", Some(2))).toDF("url", "title", "score")
    Upsert.mergeIntoTable(spark, path, delta, Seq("url"))
    val back = spark.read.parquet(path).orderBy("url").collect()
    assert(back.length == 3 && back(2).getString(1) == "t3x")
  }

  test("mergeIntoTable after a crashed swap restores the backup " +
    "instead of rebuilding from the delta alone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsertc").toString
    val path = s"$dir/articles"
    Upsert.mergeIntoTable(spark, path, base, Seq("url"))
    // crash window: live renamed to __old, new data never swapped in
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__old")))
    val delta = Seq(("u9", "t9", Some(9))).toDF("url", "title", "score")
    Upsert.mergeIntoTable(spark, path, delta, Seq("url"))
    val back = spark.read.parquet(path).collect()
    assert(back.length == base.count() + 1,
      s"prior rows lost: ${back.length}")
    assert(!new java.io.File(path + "__old").exists())
  }

  test("mergeIntoPartitionedTable after a crashed bucket swap restores " +
    "the bucket from the backup root") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pcrash").toString
    val path = s"$dir/t"
    val rows = (0 until 200).map(i => (s"u$i", i)).toDF("url", "score")
    Upsert.writePartitionedTable(rows, path, Seq("url"), numBuckets = 4)
    // crash window: one bucket renamed to the backup root, never
    // swapped back
    val bucket = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bucket="))
      .map(_.getName).sorted.head
    val bakRoot = new java.io.File(path + "__old")
    bakRoot.mkdirs()
    assert(new java.io.File(s"$path/$bucket")
      .renameTo(new java.io.File(bakRoot, bucket)))
    val delta = Seq(("u3", 999)).toDF("url", "score")
    Upsert.mergeIntoPartitionedTable(spark, path, delta, Seq("url"),
      numBuckets = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == 200, s"bucket lost: ${back.count()}")
    assert(back.filter($"url" === "u3").head.getInt(1) == 999)
  }

  test("mergeIntoPartitionedTable rewrites only the touched buckets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pmerge").toString
    val path = s"$dir/articles"
    val buckets = 8
    // enough keys that several buckets are populated
    val wide = (1 to 200).map(i => (s"u$i", s"t$i", Some(i)))
      .toDF("url", "title", "score")
    Upsert.writePartitionedTable(wide, path, Seq("url"), buckets)

    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = snapshot()
    assert(before.nonEmpty)

    // 1-row patch → exactly one bucket directory may change
    val delta = Seq(("u42", null.asInstanceOf[String], Some(9999)))
      .toDF("url", "title", "score")
    val touchedBucket = delta
      .select(Upsert.bucketOf(Seq("url"), buckets)).head.getInt(0)
    Upsert.mergeIntoPartitionedTable(spark, path, delta, Seq("url"),
      buckets, patch = true)

    val after = snapshot()
    val untouchedBefore =
      before.filterNot(_._1.contains(s"graft_bucket=$touchedBucket"))
    val untouchedAfter =
      after.filterNot(_._1.contains(s"graft_bucket=$touchedBucket"))
    // untouched buckets: identical file paths, lengths, AND mtimes
    assert(untouchedAfter == untouchedBefore)
    assert(after.keySet != before.keySet ||
      after != before) // the touched bucket did get rewritten

    // table content is the patched merge
    val back = spark.read.parquet(path)
    assert(back.count() == 200)
    val u42 = back.filter($"url" === "u42").head
    assert(u42.getAs[Int]("score") == 9999)
    assert(u42.getAs[String]("title") == "t42") // patch kept base title

    // base scan prunes to touched partitions (not a full-table read)
    val pruned = spark.read.parquet(path)
      .filter(col(Upsert.bucketCol).isin(touchedBucket))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains(Upsert.bucketCol))
  }

  test("mergeIntoPartitionedTable creates the table and rejects a " +
    "mismatched bucket count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pmerge2").toString
    val path = s"$dir/t"
    Upsert.mergeIntoPartitionedTable(spark, path, base, Seq("url"), 4)
    assert(spark.read.parquet(path).count() == 3)
    val delta = Seq(("u1", "x", Some(0))).toDF("url", "title", "score")
    intercept[IllegalArgumentException] {
      Upsert.mergeIntoPartitionedTable(spark, path, delta, Seq("url"), 16)
    }
    // matching layout merges fine and stays pruned
    Upsert.mergeIntoPartitionedTable(spark, path, delta, Seq("url"), 4)
    assert(spark.read.parquet(path)
      .filter($"url" === "u1").head.getString(1) == "x")
  }

  test("mergeIntoPartitionedTable: corrupt layout marker is a clear " +
    "error, not a StringIndexOutOfBounds") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pmerge3").toString
    val path = s"$dir/t"
    Upsert.mergeIntoPartitionedTable(spark, path, base, Seq("url"), 4)
    // truncate the marker to zero bytes
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_graft_buckets"), Array.empty[Byte])
    val delta = Seq(("u1", "x", Some(0))).toDF("url", "title", "score")
    val e = intercept[IllegalStateException] {
      Upsert.mergeIntoPartitionedTable(spark, path, delta, Seq("url"), 4)
    }
    assert(e.getMessage.contains("_graft_buckets"))
  }

  test("snapshotDiff classifies insert/delete/update and inverts " +
    "through merge + delete-anti-join") {
    val old = Seq(("k1", "a", 1), ("k2", "b", 2), ("k3", "c", 3),
      ("k4", null: String, 4)).toDF("key", "v", "n")
    val nw = Seq(("k1", "a", 1),          // unchanged → absent from diff
      ("k2", "B", 2),                      // update (value change)
      ("k4", "d", 4),                      // update (null → value)
      ("k5", "e", 5)).toDF("key", "v", "n") // insert; k3 deleted
    val diff = Upsert.snapshotDiff(old, nw, Seq("key"))
    val ops = diff.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ops == Map("k2" -> "update", "k3" -> "delete",
      "k4" -> "update", "k5" -> "insert"))
    // inversion: applyDiff(old, diff(old, new)) == new
    val rebuilt = Upsert.applyDiff(old, diff, Seq("key"))
    assert(rebuilt.exceptAll(nw).isEmpty && nw.exceptAll(rebuilt).isEmpty)
  }

  test("scd2 history: one current row per key, contiguous ranges, " +
    "point-in-time lookup") {
    val changes = Seq(
      ("k1", 1L, "draft"), ("k1", 5L, "review"), ("k1", 9L, "published"),
      ("k2", 3L, "draft")).toDF("key", "ts", "state")
    val hist = Upsert.scd2(changes, "key", "ts")
    // exactly one current version per key
    val current = hist.filter($"is_current")
    assert(current.count() == 2)
    assert(current.filter($"key" === "k1").head.getAs[String]("state")
      == "published")
    // ranges are contiguous: every non-current valid_to equals the
    // key's next valid_from (lead by construction, asserted end-to-end)
    val rows = hist.filter($"key" === "k1")
      .orderBy($"valid_from").collect()
    assert(rows.map(_.getAs[Long]("valid_from")).sameElements(Array(1L, 5L, 9L)))
    assert(rows.init.zip(rows.tail).forall { case (a, b) =>
      a.getAs[Long]("valid_to") == b.getAs[Long]("valid_from") })
    // as-of: state at t=6 is the version that started at 5
    val asOf = Upsert.scd2AsOf(hist, lit(6L))
    assert(asOf.filter($"key" === "k1").head.getAs[String]("state")
      == "review")
    assert(asOf.filter($"key" === "k2").head.getAs[String]("state")
      == "draft")
  }
}
