package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Curation, Retrieval}

/** BM25 retrieval, temperature mixture, and bloom-pruned semi join. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("bm25TopK matches a hand-computed score on a tiny corpus") {
    val docs = Seq(
      (1L, "cat dog cat"),        // tf(cat)=2, dl=3
      (2L, "dog dog dog dog"),    // no query term beyond dog
      (3L, "cat fish"),           // tf(cat)=1, dl=2
      (4L, "fish fish fish")      // no cat
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // N=4, df(cat)=2 → idf = ln(1 + 2.5/2.5) = ln 2; avgdl = 3
    val idf = math.log(2.0)
    def bm25(tf: Double, dl: Double): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(out.length == 2)
    assert(out(0) == ((1L, 1L, bm25(2, 3))))
    assert(out(1) == ((2L, 3L, bm25(1, 2))))
  }

  test("bm25TopK rank ties break by doc id on identical docs") {
    val docs = Seq((10L, "a b"), (2L, "a b"), (7L, "a b"), (5L, "zz"))
      .toDF("doc_id", "text")
    val ids = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(ids == Seq(2L, 7L, 10L))
  }

  test("bm25TopK matches a naive in-memory reference on random corpora") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    // 2 query terms: one double-add per doc, so the naive fold is
    // bit-identical to the aggregate (addition is commutative; with
    // 3+ terms only the 1e-6 quantization would guarantee parity)
    val qterms = Seq("a", "d")
    val (k1, b) = (1.2, 0.75)
    for (_ <- 0 until 3) {
      val docs = (0 until 40).map(i => (i.toLong,
        Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
          "doc_id", "text", qterms, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val toks = docs.map { case (id, t) =>
        (id, t.split("\\s+").filter(_.nonEmpty).toSeq) }
      val n = toks.size
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
      val dfm = qterms.map(t => t -> toks.count(_._2.contains(t))).toMap
      val scores = toks.flatMap { case (id, tk) =>
        val s = qterms.map { t =>
          val tf = tk.count(_ == t).toDouble
          if (tf == 0) 0.0 else {
            val idf = math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            idf * tf * (k1 + 1.0) /
              (tf + k1 * ((1.0 - b) + b * tk.size / avgdl))
          }
        }.sum
        if (s > 0) Some(id -> (math.floor(s * 1e6 + 0.5) / 1e6)) else None
      }
      val expected = scores.sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
      assert(got.toSeq == expected)
    }
  }

  test("bm25TopKBatch equals one bm25TopK per query — same ranks, " +
    "same quantized scores") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val docs = (0 until 60).map(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val queryDefs = Seq(1L -> Seq("a", "d"), 2L -> Seq("b", "f"),
      3L -> Seq("d", "g"))
    val batch = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
        queryDefs.toDF("query_id", "terms"), "query_id", "terms", k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val single = queryDefs.flatMap { case (qid, terms) =>
      Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 8)
        .collect()
        .map(r => (qid, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(batch == single)
  }

  test("bm25TopKBatch: a term shared across queries scores each " +
    "query independently (df is per-term, not per-query)") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "z z")).toDF("doc_id", "text")
    val qs = Seq(10L -> Seq("x"), 20L -> Seq("x", "z"))
      .toDF("query_id", "terms")
    val out = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
        qs, "query_id", "terms", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // query 10 ranks only the x-docs; query 20 sees all three
    assert(out.count(_._1 == 10L) == 2)
    assert(out.count(_._1 == 20L) == 3)
    // identical x-only score for docs 1 and 2 in BOTH queries → the
    // shared doc ranks by id tie-break under query 10
    assert(out.filter(_._1 == 10L).map(t => (t._2, t._3)).toSeq
      .sorted == Seq((1L, 1L), (2L, 2L)))
  }

  test("bm25FromIndex over a built index equals bm25TopKBatch from " +
    "scratch — index amortization changes no output value") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val docs = (0 until 50).map(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val qs = Seq(1L -> Seq("a", "d"), 2L -> Seq("b", "g"))
      .toDF("query_id", "terms")
    val direct = Retrieval.bm25TopKBatch(docs, "doc_id", "text",
        qs, "query_id", "terms", k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val (post, stats) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    val served = Retrieval.bm25FromIndex(post, stats,
        qs, "query_id", "terms", k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(served == direct)
    // a null element in a caller-supplied terms array is dropped, not
    // an NPE in the driver-side term collect (the pushed-predicate
    // path must keep the old semi join's null tolerance)
    val qsNull = spark.sql(
      "SELECT 1L AS query_id, array('a', CAST(NULL AS STRING), 'd') AS terms " +
      "UNION ALL SELECT 2L, array('b', 'g')")
    val servedNull = Retrieval.bm25FromIndex(post, stats,
        qsNull, "query_id", "terms", k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(servedNull == direct)
  }

  test("appendToBm25Index ≡ full rebuild over the union: delta-only " +
    "maintenance changes no served ranking") {
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def corpus(ids: Range) = ids.map(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val base = corpus(0 until 40)
    val delta = corpus(40 until 60)
    val qs = Seq(1L -> Seq("a", "e"), 2L -> Seq("c", "f"))
      .toDF("query_id", "terms")
    val (p0, s0) = Retrieval.buildBm25Index(base, "doc_id", "text")
    val (pa, sa) = Retrieval.appendToBm25Index(p0, s0, delta,
      "doc_id", "text")
    val (pf, sf) = Retrieval.buildBm25Index(base.unionByName(delta),
      "doc_id", "text")
    def serve(p: org.apache.spark.sql.DataFrame,
              s: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25FromIndex(p, s, qs, "query_id", "terms", k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(serve(pa, sa) == serve(pf, sf))
  }

  test("deleteFromBm25Index ≡ full rebuild without the deleted docs: " +
    "anti-join postings + additive stats decrement change no ranking") {
    val rnd = new scala.util.Random(59)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0 until 60).map(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val qs = Seq(1L -> Seq("a", "e"), 2L -> Seq("c", "f"))
      .toDF("query_id", "terms")
    val (p0, s0) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    // every 4th doc leaves, plus an id NOT in the index (must no-op)
    val delIds = ((0 until 60 by 4).map(_.toLong) :+ 999L).toDF("doc_id")
    val (pd, sd) = Retrieval.deleteFromBm25Index(p0, s0, delIds, "doc_id")
    val (pf, sf) = Retrieval.buildBm25Index(
      docs.filter(!$"doc_id".isin((0 until 60 by 4).map(_.toLong): _*)),
      "doc_id", "text")
    def serve(p: org.apache.spark.sql.DataFrame,
              s: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25FromIndex(p, s, qs, "query_id", "terms", k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(serve(pd, sd) == serve(pf, sf))
    // the deleted docs are really gone from the postings relation
    assert(pd.filter($"doc_id" % 4 === 0).count() == 0)
  }

  test("deleteFromBm25Index of every doc leaves an empty, servable " +
    "index (n_docs=0, no division blow-up)") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val (p0, s0) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    val (pd, sd) = Retrieval.deleteFromBm25Index(p0, s0,
      Seq(1L, 2L).toDF("doc_id"), "doc_id")
    assert(pd.count() == 0)
    val st = sd.collect()(0)
    assert(st.getLong(0) == 0L && st.getDouble(1) == 0.0)
  }

  test("updateBm25Index (delete + append, the reference's $set shape) " +
    "≡ full rebuild over the updated corpus") {
    val rnd = new scala.util.Random(61)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def text() = Seq.fill(1 + rnd.nextInt(10))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 50).map(i => (i.toLong, text()))
    val updated = (0 until 50 by 5).map(i => (i.toLong, text()))
    val qs = Seq(1L -> Seq("a", "d"), 2L -> Seq("b", "f"))
      .toDF("query_id", "terms")
    val (p0, s0) = Retrieval.buildBm25Index(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val (pu, su) = Retrieval.updateBm25Index(p0, s0,
      updated.toDF("doc_id", "text"), "doc_id", "text")
    val newCorpus = (docs.toMap ++ updated.toMap).toSeq
      .map { case (id, t) => (id, t) }
    val (pf, sf) = Retrieval.buildBm25Index(
      newCorpus.toDF("doc_id", "text"), "doc_id", "text")
    def serve(p: org.apache.spark.sql.DataFrame,
              s: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25FromIndex(p, s, qs, "query_id", "terms", k = 10)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    assert(serve(pu, su) == serve(pf, sf))
  }

  test("updateBm25Index with an EMPTY batch is a no-op: stats stay " +
    "bit-identical (no NULL-poisoned avgdl) and serving still scores") {
    val docs = Seq((1L, "cat dog cat"), (2L, "dog fish"), (3L, "cat"))
      .toDF("doc_id", "text")
    val (p0, s0) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    val empty = docs.limit(0)
    val (p1, s1) = Retrieval.updateBm25Index(p0, s0, empty,
      "doc_id", "text")
    val before = s0.collect()(0)
    val after = s1.collect()(0)
    assert(after.getLong(0) == before.getLong(0))
    assert(!after.isNullAt(1), "empty update NULL-poisoned avgdl")
    assert(after.getDouble(1) == before.getDouble(1))
    assert(p1.count() == p0.count())
    // and the same through the bare append arm
    val (_, s2) = Retrieval.appendToBm25Index(p0, s0, empty,
      "doc_id", "text")
    assert(!s2.collect()(0).isNullAt(1))
    // scores remain real numbers, identical to the untouched index
    val qs = Seq(1L -> Seq("cat")).toDF("query_id", "terms")
    def serve(p: org.apache.spark.sql.DataFrame,
              s: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25FromIndex(p, s, qs, "query_id", "terms", k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    assert(serve(p1, s1) == serve(p0, s0) && serve(p1, s1).nonEmpty)
  }

  test("appendToBm25Index onto an EMPTY index adopts the delta's " +
    "stats (the symmetric NULL arm)") {
    val docs = Seq((1L, "cat dog cat"), (2L, "dog fish"))
      .toDF("doc_id", "text")
    val (pe, se) = Retrieval.buildBm25Index(docs.limit(0),
      "doc_id", "text")
    val (pa, sa) = Retrieval.appendToBm25Index(pe, se, docs,
      "doc_id", "text")
    val (pf, sf) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    val got = sa.collect()(0)
    val want = sf.collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getDouble(1) == want.getDouble(1))
    assert(pa.count() == pf.count())
  }

  test("bm25FromIndex fails LOUDLY past the distinct-term cap instead " +
    "of degrading the driver; the bounded path is untouched") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val (p0, s0) = Retrieval.buildBm25Index(docs, "doc_id", "text")
    val wide = Seq(1L -> (0 until 40).map(i => s"t$i"))
      .toDF("query_id", "terms")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25FromIndex(p0, s0, wide, "query_id", "terms",
        k = 5, maxBatchTerms = 16).collect()
    }
    assert(e.getMessage.contains("distinct-term cap"))
    // the same batch under a sufficient cap serves normally
    assert(Retrieval.bm25FromIndex(p0, s0, wide, "query_id", "terms",
      k = 5, maxBatchTerms = 64).count() == 0) // no vocab overlap: 0 hits
    val qs = Seq(1L -> Seq("b")).toDF("query_id", "terms")
    assert(Retrieval.bm25FromIndex(p0, s0, qs, "query_id", "terms",
      k = 5).count() == 2)
  }

  test("rrfFuse: a doc ranked by BOTH arms outranks docs ranked by " +
    "one; missing arms contribute nothing; jaccard arm scores sets") {
    val armA = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val armB = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val fused = Retrieval.rrfFuse(Seq(armA, armB), rrfK = 60, k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // doc 11: 1/62 + 1/61 beats doc 10's single 1/61
    assert(fused(1L) == 11L, s"fused order: $fused")
    assert(fused(2L) == 10L)
    // jaccard arm: exact set overlap ratio, distinct-token semantics
    val docs = Seq((1L, "a b b c"), (2L, "a x y z"), (3L, "p q"))
      .toDF("doc_id", "text")
    val qs = Seq((7L, Seq("a", "b"))).toDF("query_id", "terms")
    val ja = Retrieval.tokenJaccardTopK(docs, "doc_id", "text",
        qs, "query_id", "terms", k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // doc 1: |{a,b}∩{a,b,c}|=2, |∪|=3 → 2/3; doc 2: 1/5; doc 3 absent
    assert(ja(1L) == math.floor(2.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(ja(2L) == 0.2 && !ja.contains(3L))
  }

  test("temperatureMixture: α=1 is proportional, α→0 flattens, " +
    "targets honor the budget and caps") {
    val docs = (0 until 900).map { i =>
      val src = if (i < 600) "big" else if (i < 870) "mid" else "tiny"
      (src, i.toLong)
    }.toDF("src", "id")
    def targets(alpha: Double, budget: Long): Map[String, Long] =
      Curation.temperatureMixture(docs, "src", "id", budget, alpha, "t")
        .groupBy("src").agg(max("target").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val prop = targets(1.0, 300)
    // α=1: weights ∝ counts — 600/900, 270/900, 30/900 of 300; the
    // floor allocation under-fills tiny by one (floor(300·0.0333…)=9)
    assert(prop == Map("big" -> 200L, "mid" -> 90L, "tiny" -> 9L))
    val flat = targets(0.001, 300)
    // α≈0: all weights ≈ 1/3 → equal 100-doc targets, except tiny,
    // which hits its nₛ = 30 cap
    assert(flat("big") == 100L && flat("mid") == 100L &&
      flat("tiny") == 30L)
    // budget larger than a stratum: target capped at n_s
    val capped = targets(0.5, 5000)
    assert(capped("tiny") <= 30L)
  }

  test("temperatureMixture admits a deterministic subset near the target") {
    val docs = (0 until 1000).map(i => ("s", i.toLong)).toDF("src", "id")
    val kept = Curation.temperatureMixture(docs, "src", "id", 250L, 0.5, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    val again = Curation.temperatureMixture(docs, "src", "id", 250L, 0.5, "k")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == again)                 // seeded — same draw every run
    // one source → w quantizes to 1.0 → target = min(1000, 250) = 250;
    // admission is a 32-bit uniform cut: kept ≈ target within ~4σ
    assert(math.abs(kept.size - 250) < 60)
  }

  test("temperatureMixture admission set equals a from-scratch " +
    "Java-md5 replay of the draw") {
    val docs = (0 until 800).map { i =>
      (if (i % 3 == 0) "en" else "de", i.toLong) }.toDF("src", "id")
    val kept = Curation.temperatureMixture(docs, "src", "id",
        budget = 200L, alpha = 0.5, seed = "rx")
      .select("id").collect().map(_.getLong(0)).toSet
    // independent reimplementation: same md5 draw, weights, targets
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(key: String): Long = {
      val h = md.digest(s"rx:$key".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        h.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val rows = (0 until 800).map(i =>
      (if (i % 3 == 0) "en" else "de", i.toLong))
    val ns = rows.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val z = ns.values.map(n => math.pow(n.toDouble, 0.5)).sum
    val naive = rows.filter { case (s, id) =>
      val w = math.floor(math.pow(ns(s).toDouble, 0.5) / z * 1e9 + 0.5) / 1e9
      val target = math.min(ns(s).toDouble,
        math.floor(200L * w)).toLong
      u32(id.toString) * ns(s) < target * 4294967296L
    }.map(_._2).toSet
    assert(kept == naive)
  }

  test("bloomSemiJoin equals the plain left-semi join") {
    val probe = (0L until 3000L).map(i => (i, s"p$i")).toDF("k", "pv")
    val build = (0L until 3000L by 17L).map(i => (i, "x")).toDF("bk", "x")
    val plain = probe.join(build, probe("k") === build("bk"), "left_semi")
      .select("k").collect().map(_.getLong(0)).toSet
    val bloomed = BloomJoin.bloomSemiJoin(probe, "k", build, "bk")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(bloomed == plain)
    assert(plain.size == (3000 + 16) / 17)
  }

  test("bloom pre-filter actually prunes non-matching probe rows") {
    val probe = (0L until 5000L).toDF("k")
    val build = Seq(1L, 2L, 3L).toDF("bk")
    val bloom = BloomJoin.buildBloom(build, "bk", expectedItems = 1000L)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val passed = probe.filter(ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          ColumnBridge.expression(lit(bloom)),
          ColumnBridge.expression(xxhash64($"k"))))).count()
    // all 3 members pass; false positives stay ≈ fpp · 4997 ≪ 5000
    assert(passed >= 3 && passed < 500)
  }

  // ------------------------------------------------------------ MMR

  private def mmrFixture(rows: Seq[(Long, Long, Double, Seq[Double])]) =
    rows.toDF("q", "id", "rel", "vec")

  test("mmrRerank diversifies: a redundant near-dup loses to a " +
      "distinct lower-rel candidate") {
    // candidates: two near-identical high-rel vectors + one orthogonal
    // mid-rel vector. Pure relevance ranks the twin second; MMR at
    // λ=0.5 must rank the orthogonal one second.
    val cand = mmrFixture(Seq(
      (1L, 10L, 0.95, Seq(1.0, 0.0, 0.0)),
      (1L, 11L, 0.94, Seq(0.999, 0.01, 0.0)),   // near-dup of 10
      (1L, 12L, 0.60, Seq(0.0, 1.0, 0.0))))
    val picks = Retrieval.mmrRerank(cand, "q", "id", "rel", "vec",
        k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    assert(picks.toSeq == Seq(10L, 12L, 11L))
  }

  test("mmrRerank at full λ weight ≡ relevance order") {
    val cand = mmrFixture(Seq(
      (1L, 10L, 0.3, Seq(1.0, 0.0)), (1L, 11L, 0.9, Seq(1.0, 0.0)),
      (1L, 12L, 0.5, Seq(0.0, 1.0))))
    val picks = Retrieval.mmrRerank(cand, "q", "id", "rel", "vec",
        k = 3, lambda = 1.0, penaltyWeight = 0.0)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    assert(picks.toSeq == Seq(11L, 12L, 10L))
  }

  test("mmrRerank negative neighborhood REWARDS (no clamp at zero)") {
    // second pick's only neighbor is anti-correlated: its MMR score
    // must EXCEED λ·rel (the penalty term flips sign) — regression for
    // a max(0, ·) clamp that silently zeroed negative similarities.
    val cand = mmrFixture(Seq(
      (1L, 10L, 0.9, Seq(1.0, 0.0)),
      (1L, 11L, 0.5, Seq(-1.0, 0.0))))
    val rows = Retrieval.mmrRerank(cand, "q", "id", "rel", "vec",
        k = 2, lambda = 0.7, penaltyWeight = 0.3)
      .orderBy("mmr_rank").collect()
    assert(rows(1).getLong(2) == 11L)
    assert(rows(1).getDouble(3) > 0.7 * 0.5 + 1e-9)
    assert(math.abs(rows(1).getDouble(3) - (0.7 * 0.5 + 0.3)) < 1e-9)
  }

  test("mmrRerank degrades gracefully on degenerate vectors: a " +
      "zero-norm candidate scores cosine 0, never NaN, never crashes") {
    // the zero vector would make every cos() at rank ≥ 2 NaN without
    // the guard — score > bestScore never fires, best stays -1 and
    // taken(-1) throws for the whole partition
    val cand = mmrFixture(Seq(
      (1L, 10L, 0.9, Seq(1.0, 0.0)),
      (1L, 11L, 0.8, Seq(0.0, 0.0)),   // zero-norm
      (1L, 12L, 0.5, Seq(0.0, 1.0))))
    val rows = Retrieval.mmrRerank(cand, "q", "id", "rel", "vec",
        k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect()
    assert(rows.length == 3)
    // zero-norm neighbor carries zero penalty: 11 scores λ·0.8 - 0
    assert(rows(1).getLong(2) == 11L)
    assert(math.abs(rows(1).getDouble(3) - 0.5 * 0.8) < 1e-9)
    assert(rows.forall(r => !r.getDouble(3).isNaN))
    // a NaN rel must truncate the ranking, not throw
    val nan = Retrieval.mmrRerank(mmrFixture(Seq(
        (1L, 10L, Double.NaN, Seq(1.0, 0.0)))),
      "q", "id", "rel", "vec", k = 2)
    assert(nan.count() == 0)
  }

  test("mmrRerank ties break by ascending id; k past n returns n; " +
      "groups stay independent") {
    val cand = mmrFixture(Seq(
      (1L, 20L, 0.8, Seq(1.0, 0.0)), (1L, 19L, 0.8, Seq(0.0, 1.0)),
      (2L, 30L, 0.4, Seq(1.0, 1.0))))
    val out = Retrieval.mmrRerank(cand, "q", "id", "rel", "vec",
        k = 5, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq((1L, 1L, 19L), (1L, 2L, 20L), (2L, 1L, 30L)))
  }
}
