package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** CCNet-style bigram-LM perplexity: exact hand-computed scores,
  * smoothing fallbacks, unscorable routing, and tier partitioning.
  */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("fitBigramLm counts unigrams/bigrams and perplexity replays " +
    "add-one smoothing exactly on a hand-computed case") {
    val ref = Seq("a b a b").toDF("text")
    val lm = LangModel.fitBigramLm(ref, "text")
    assert(lm.vocab == 2)
    val uni = lm.unigrams.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 2L, "b" -> 2L))
    val bi = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bi == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
    // candidate "a b": one transition, p(b|a) = (2+1)/(2+2) = 0.75
    // → avg_nll = −ln(.75) ≈ 0.287682, ppl = 4/3 ≈ 1.333333
    val out = LangModel.perplexity(Seq((1L, "a b")).toDF("id", "text"),
      "id", "text", lm).collect().head
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L)
    assert(out.getDouble(3) == math.floor(-math.log(0.75) * 1e6 + 0.5) / 1e6)
    assert(out.getDouble(4) == 1.333333)
  }

  test("unseen contexts fall back to 1/V; docs under two tokens are " +
    "unscorable (null ppl, zero transitions)") {
    val lm = LangModel.fitBigramLm(Seq("a b a b").toDF("text"), "text")
    // "z q": unseen tok1 z → p = (0+1)/(0+2) = 0.5
    val rows = LangModel.perplexity(
      Seq((1L, "z q"), (2L, "solo"), (3L, ""),
        (4L, null.asInstanceOf[String])).toDF("id", "text"),
      "id", "text", lm).orderBy("doc_id").collect()
    assert(rows(0).getDouble(4) == 2.0) // ppl of constant p=.5
    assert(rows(1).getLong(2) == 0L && rows(1).isNullAt(4))
    assert(rows(2).getLong(1) == 0L && rows(2).isNullAt(4))
    // null text tokenizes to ZERO (not SQL-legacy −1) and is unscorable
    assert(rows(3).getLong(1) == 0L && rows(3).getLong(2) == 0L &&
      rows(3).isNullAt(4))
  }

  test("model lifecycle: save/reload serves identically, and " +
    "appendToBigramLm is count-identical to a refit on the union") {
    val base = Seq("a b c a b", "c a b c").toDF("text")
    val delta = Seq("b c d d", "a d").toDF("text")
    val lm = LangModel.fitBigramLm(base, "text")
    val dir = java.nio.file.Files.createTempDirectory("bigram_lm")
      .toString
    LangModel.saveBigramLm(lm, dir)
    val re = LangModel.loadBigramLm(spark, dir)
    assert(re.vocab == lm.vocab)
    val docs = Seq((1L, "a b c d"), (2L, "d c b a")).toDF("id", "text")
    def serve(m: LangModel.BigramLm) =
      LangModel.perplexity(docs, "id", "text", m).orderBy("doc_id")
        .collect().map(_.toString).toSeq
    assert(serve(re) == serve(lm))
    // incremental append ≡ union refit, count for count
    val inc = LangModel.appendToBigramLm(lm, delta, "text")
    val full = LangModel.fitBigramLm(base.unionByName(delta), "text")
    assert(inc.vocab == full.vocab)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(key(inc.unigrams) == key(full.unigrams))
    assert(key(inc.bigrams) == key(full.bigrams))
    assert(serve(inc) == serve(full))
  }

  test("per-language models: each doc scores against its OWN " +
    "language's LM, tiers partition within a language, and docs of an " +
    "unfitted language route to 'na'") {
    val enPat = "the cat sat on the mat and the dog sat on the rug"
    val xxPat = "foo bar baz qux foo bar baz qux quux corge grault"
    val ref = ((0 until 30).map(_ => ("en", enPat)) ++
      (0 until 30).map(_ => ("xx", xxPat))).toDF("lang", "text")
    val lm = LangModel.fitBigramLmPerLang(ref, "lang", "text")
    // per-lang candidates at three distortion levels + one unknown lang
    val docs = Seq(
      (1L, "en", enPat),
      (2L, "en", "the cat sat on the rug and the dog sat"),
      (3L, "en", "rug the on dog mat cat the sat and on the"),
      (4L, "xx", xxPat),
      (5L, "xx", "foo bar baz corge quux qux foo"),
      (6L, "xx", "grault foo corge bar quux baz qux foo bar"),
      (7L, "zz", "unfitted language text here")).toDF("id", "lang", "text")
    val scored = LangModel.perplexityPerLang(docs, "id", "lang",
      "text", lm)
    val byId = scored.collect().map(r => r.getLong(0) -> r).toMap
    // in-distribution beats distorted WITHIN each language
    assert(byId(1L).getDouble(5) < byId(3L).getDouble(5))
    assert(byId(4L).getDouble(5) < byId(6L).getDouble(5))
    assert(byId(7L).isNullAt(5), "unfitted language must be unscorable")
    val tiers = LangModel.perplexityTiersPerLang(scored).collect()
      .map(r => r.getLong(1) -> r.getString(6)).toMap
    // each language partitions independently: both get a head even
    // though en and xx perplexities live on different scales
    assert(tiers(1L) == "head" && tiers(4L) == "head")
    assert(tiers(3L) == "tail" && tiers(6L) == "tail")
    assert(tiers(7L) == "na")
  }

  test("streaming ingest: micro-batches of reference text appended in " +
    "foreachBatch converge to exactly the batch-fit model (the q111 " +
    "shape for the LM — a live reference corpus grows without ever " +
    "re-tokenizing history)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.{Dataset, Row}
    val dir = java.nio.file.Files
      .createTempDirectory("lm_stream").toString
    val texts = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(12)("w" + rnd.nextInt(30)).mkString(" "))
    }
    // generation 0: first 10 docs fit and persisted
    LangModel.saveBigramLm(LangModel.fitBigramLm(
      texts.take(10).toDF("id", "text"), "text"), s"$dir/lm_seed")
    @volatile var cur = s"$dir/lm_seed"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val sink: (Dataset[Row], Long) => Unit = (batch, id) => {
      val next = s"$dir/lm_$id"
      LangModel.saveBigramLm(
        LangModel.appendToBigramLm(LangModel.loadBigramLm(spark, cur),
          batch.toDF("id", "text"), "text"), next)
      cur = next
    }
    stream.addData(texts.slice(10, 25))
    val q = stream.toDS().toDF("id", "text").writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch(sink)
      .start()
    q.awaitTermination()
    stream.addData(texts.slice(25, 40))
    val q2 = stream.toDS().toDF("id", "text").writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch(sink)
      .start()
    q2.awaitTermination()
    val streamed = LangModel.loadBigramLm(spark, cur)
    val batchFit = LangModel.fitBigramLm(texts.toDF("id", "text"),
      "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(streamed.vocab == batchFit.vocab)
    assert(key(streamed.unigrams) == key(batchFit.unigrams))
    assert(key(streamed.bigrams) == key(batchFit.bigrams))
  }

  test("in-distribution text scores lower perplexity than shuffled " +
    "text, and tiers partition head ≤ middle ≤ tail with na routing") {
    val pattern = "the cat sat on the mat and the dog sat on the rug"
    val ref = (0 until 50).map(i => pattern).toDF("text")
    val lm = LangModel.fitBigramLm(ref, "text")
    val docs = Seq(
      (1L, pattern),                                     // in-dist
      (2L, "the cat sat on the rug and the dog sat"),    // near
      (3L, "rug the on dog mat cat the sat and on the"), // shuffled
      (4L, "x")).toDF("id", "text")                      // unscorable
    val scored = LangModel.perplexity(docs, "id", "text", lm)
    val byId = scored.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getDouble(4) < byId(2L).getDouble(4))
    assert(byId(2L).getDouble(4) < byId(3L).getDouble(4))
    val tiers = LangModel.perplexityTiers(scored).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(tiers == Map(1L -> "head", 2L -> "middle", 3L -> "tail",
      4L -> "na"))
  }
}
