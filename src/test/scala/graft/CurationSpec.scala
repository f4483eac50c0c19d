package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Properties of the curation operators beyond what the DuckDB-oracled
  * queries (q64-q68) already pin value-for-value.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("stratifiedSample: deterministic, subset-stable, fraction-" +
    "accurate, absent strata dropped") {
    import spark.implicits._
    val df = (0 until 4000).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    val fr = Map("a" -> 0.5)
    val s1 = Curation.stratifiedSample(df, "g", "id", fr, "s1")
      .collect().map(_.getLong(0)).toSet
    // deterministic: same seed → identical sample
    val s2 = Curation.stratifiedSample(df, "g", "id", fr, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // absent stratum dropped entirely
    assert(s1.forall(_ % 2 == 0))
    // keep rate near the fraction (2000 draws, ±5 pp)
    assert(math.abs(s1.size / 2000.0 - 0.5) < 0.05, s"rate ${s1.size}")
    // per-key decisions are independent of the rest of the frame:
    // sampling a subset keeps exactly the intersection
    val sub = Curation.stratifiedSample(df.filter($"id" < 1000), "g", "id",
      fr, "s1").collect().map(_.getLong(0)).toSet
    assert(sub == s1.filter(_ < 1000))
    // different seed → different sample
    val s3 = Curation.stratifiedSample(df, "g", "id", fr, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(s3 != s1)
  }

  test("weightedSample: deterministic, exactly n per group, heavy " +
    "weights win more often, zero/null weights dropped") {
    import spark.implicits._
    // two strata of weights: ids 0-99 weight 100, ids 100-199 weight 1
    val df = ((0 until 100).map(i => (i.toLong, "g", 100.0)) ++
      (100 until 200).map(i => (i.toLong, "g", 1.0)) ++
      Seq((900L, "g", 0.0), (901L, "g", null.asInstanceOf[Double])))
      .toDF("id", "g", "w")
    val s1 = Curation.weightedSample(df, "g", "id", "w", n = 20, "s")
      .collect().map(_.getLong(0)).toSeq
    assert(s1.length == 20)
    assert(!s1.contains(900L) && !s1.contains(901L))
    // deterministic
    val s2 = Curation.weightedSample(df, "g", "id", "w", n = 20, "s")
      .collect().map(_.getLong(0)).toSeq
    assert(s1 == s2)
    // the 100× heavier stratum should dominate the sample
    val heavy = s1.count(_ < 100)
    assert(heavy >= 15, s"only $heavy/20 from the heavy stratum")
    // ranks are 1..n within the group
    val ranks = Curation.weightedSample(df, "g", "id", "w", n = 20, "s")
      .select("rank").collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 20L))
  }

  test("decontaminate: exact-copy and heavy-overlap docs dropped, " +
    "clean docs and sub-threshold overlaps survive") {
    import spark.implicits._
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, evalDoc),                                   // exact copy → dropped
      (2L, "alpha beta gamma delta epsilon zeta prime"), // 4 shared 3-grams < 5 → survives
      (3L, "totally unrelated words about nothing at all here"),
      (4L, s"prefix words then $evalDoc and a suffix") // contains eval → dropped
    ).toDF("id", "text")
    val eval = Seq(Tuple1(evalDoc)).toDF("text")
    val out = Curation.decontaminate(corpus, "text", "id", eval, "text",
        n = 3, minHits = 5L)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L), s"got $out")
  }

  test("repetitionMetrics: fractions in range, exact on a known doc") {
    import spark.implicits._
    val m = Curation.repetitionMetrics(
      Seq((1L, "a b a b c"), (2L, "x"), (3L, "y y y y")).toDF("id", "text"),
      "id", "text").collect().map(r => r.getLong(0) -> r).toMap
    // "a b a b c": 5 words, 3 distinct -> dup 0.4; bigrams
    // [a b, b a, a b, b c] -> top "a b" 2/4 = 0.5
    assert(m(1L).getDouble(2) == 0.4 && m(1L).getDouble(3) == 0.5)
    // single word: no bigrams -> 0.0, not null
    assert(m(2L).getDouble(3) == 0.0)
    // "y y y y": dup 0.75, all bigrams identical -> 1.0
    assert(m(3L).getDouble(2) == 0.75 && m(3L).getDouble(3) == 1.0)
  }

  test("hashSplit: deterministic, complete, and ~12/2/2 proportioned") {
    val splits = docs.select(Curation.hashSplit(col("text")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    val total = splits.values.sum
    // 12/16 expected for train; allow wide slack on 500 docs
    assert(splits("train") > total / 2)
    // identical text -> identical split (the no-leakage property)
    val again = docs.select(Curation.hashSplit(col("text")).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == splits)
  }

  test("packByBudget: packs hold ~budget tokens and ids are contiguous") {
    import spark.implicits._
    val budget = 100L
    val packed = Curation.packByBudget(
      Seq.tabulate(50)(i => (i.toLong, "g", 30L)).toDF("id", "g", "tokens"),
      "g", "id", "tokens", budget)
    // every pack's pre-pack offset is < (pack_id+1)*budget by def;
    // check pack sums: all full packs carry >= budget - max_token + 1
    val sums = packed.groupBy("pack_id").agg(sum("tokens").as("t"))
      .orderBy("pack_id").collect().map(_.getLong(1))
    assert(sums.init.forall(t => t >= budget - 30 + 1 && t <= budget + 29))
    // pack ids are a contiguous 0-based range
    val ids = packed.select("pack_id").distinct()
      .orderBy("pack_id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.indices.map(_.toLong)))
  }

  test("quotaCap: per-group sizes bounded by the group's quota") {
    val quota = when(col("source") === "src0", 7).otherwise(3)
    val kept = Curation.quotaCap(docs, "source", quota,
      col("n_chars").desc, col("doc_id").asc)
    val sizes = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(n <= (if (src == "src0") 7 else 3), s"$src overflowed: $n")
    }
  }

  test("packByBudget property: random token sequences always satisfy " +
    "the start-offset invariant") {
    import spark.implicits._
    // property: a row with pack_id p has strictly less than p*budget +
    // budget tokens before it, and at least p*budget (by definition of
    // floor(cum_before/budget)) — over random token sizes
    val gen = Gen.listOfN(60, Gen.choose(1L, 500L))
    (0 until 10).foreach { trial =>
      val tokens = gen(Gen.Parameters.default, Seed(7L + trial)).get
      val df = tokens.zipWithIndex
        .map { case (t, i) => (i.toLong, "g", t) }.toDF("id", "g", "tokens")
      val packed = Curation.packByBudget(df, "g", "id", "tokens", 1000L)
        .orderBy("id").collect()
      var cum = 0L
      packed.foreach { r =>
        val p = r.getAs[Long]("pack_id")
        assert(p == cum / 1000L, s"trial $trial row ${r.getLong(0)}")
        cum += r.getAs[Long]("tokens")
      }
    }
  }

  test("hashSplit property: every non-null text gets exactly one " +
    "split, stable under re-evaluation") {
    import spark.implicits._
    val texts = (0 until 50).flatMap(i =>
      Gen.alphaNumStr.map(_.take(40))(Gen.Parameters.default, Seed(i.toLong)))
    val df = texts.toDF("text")
      .select(col("text"), Curation.hashSplit(col("text")).as("s"))
    val rows = df.collect()
    assert(rows.forall(r => Set("train", "val", "test")(r.getString(1))))
    // same text -> same split on an independent evaluation
    val again = texts.toDF("text")
      .select(Curation.hashSplit(col("text"))).collect().map(_.getString(0))
    assert(rows.map(_.getString(1)).sameElements(again))
  }

  test("curation ops tolerate null and empty texts") {
    import spark.implicits._
    val weird = Seq((1L, null: String, "en"), (2L, "", "en"),
      (3L, "   ", "en"), (4L, "one fine doc right here", "en"))
      .toDF("doc_id", "text", "lang")
    // metrics: null/empty/whitespace docs have no words -> no row (the
    // explode drops them), real docs come through
    val m = Curation.repetitionMetrics(weird, "doc_id", "text")
    assert(m.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
    // scalar stages must not throw on null; null in -> null out
    val r = weird.select(Curation.hashSplit(col("text")).as("s"),
      Curation.scrubPii(col("text")).as("p")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    // curate end-to-end on the degenerate frame: no crash, and only
    // docs that clear every gate survive
    val kept = Curation.curate(weird, "doc_id", "text")
    assert(kept.count() <= 1)
  }

  test("scrubPii is idempotent and removes every counted match") {
    import spark.implicits._
    val lines = Seq(
      "a@b.com then 1.2.3.4 then +1 222 333 4444 end").toDF("line")
    val once = lines.select(Curation.scrubPii(col("line")).as("r"))
    val twice = once.select(Curation.scrubPii(col("r")).as("r"))
    assert(once.head.getString(0) == twice.head.getString(0))
    val counts = once.select(
      Curation.piiCount(col("r"), "email").as("e"),
      Curation.piiCount(col("r"), "ip").as("i"),
      Curation.piiCount(col("r"), "phone").as("p")).head
    assert(counts.getInt(0) == 0 && counts.getInt(1) == 0 &&
      counts.getInt(2) == 0)
  }

  test("paddedBatchStats: length-sorted batching never pads more than " +
    "arrival order; batch sizes and pad arithmetic hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 321).map(i => (i.toLong, 1L + rnd.nextInt(500)))
      .toDF("id", "tokens")
    def stats(sorted: Boolean) =
      Curation.paddedBatchStats(docs, "id", "tokens", 32, sorted)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    val srt = stats(sorted = true)
    val arr = stats(sorted = false)
    // 321 docs at B=32 -> 10 full batches + one single-doc batch
    assert(srt.length == 11 && arr.length == 11)
    assert(srt.map(_._1).sorted.toSeq == (Seq.fill(10)(32L) :+ 1L).sorted)
    // pad arithmetic: n*max - sum, never negative
    (srt ++ arr).foreach { case (n, mx, sm, pad) =>
      assert(pad == n * mx - sm && pad >= 0)
    }
    assert(srt.map(_._4).sum <= arr.map(_._4).sum,
      s"sorted ${srt.map(_._4).sum} > arrival ${arr.map(_._4).sum}")
  }

  test("clusterSample: per-cluster caps hold, central keeps the " +
    "nearest-to-centroid members, diverse keeps the farthest — " +
    "complementary picks from the same assignment") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // two planted blobs far apart + per-point noise
    val pts = (0 until 120).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i.toLong, Array.tabulate(8)(d =>
        base + rnd.nextGaussian() * 0.5 + d * 0.01))
    }.toSeq.toDF("vec_id", "embedding")
    val model = Similarity.fitIvf(pts, "embedding", nlist = 2,
      trainSample = 120)
    val central = Curation.clusterSample(pts, "vec_id", "embedding",
      model, perCluster = 7).collect()
    assert(central.length == 14) // 2 cells × 7
    val byCell = central.groupBy(_.getAs[Int]("cell"))
    assert(byCell.size == 2 && byCell.values.forall(_.length == 7))
    // ranks are 1..7 within each cell, distances nondecreasing
    byCell.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("cell_rank"))
      assert(sorted.map(_.getAs[Int]("cell_rank")).toSeq == (1 to 7))
      val ds = sorted.map(_.getAs[Double]("cell_dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // diverse picks the other end: max central dist < min diverse dist
    val diverse = Curation.clusterSample(pts, "vec_id", "embedding",
      model, perCluster = 7, central = false).collect()
    val maxCentral = central.map(_.getAs[Double]("cell_dist")).max
    val minDiverse = diverse.map(_.getAs[Double]("cell_dist")).min
    assert(maxCentral < minDiverse,
      s"central max $maxCentral !< diverse min $minDiverse")
    assert(central.map(_.getAs[Long]("vec_id")).toSet
      .intersect(diverse.map(_.getAs[Long]("vec_id")).toSet).isEmpty)
  }
}
