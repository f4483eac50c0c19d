package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Pins the distributed BPE trainer (TextAnalysis.bpeTrain) against
  * hand-computed greedy merges on corpora small enough to count by
  * hand, the overlap and tie-break conventions, the early-stop
  * contract, and the composition guarantee: a trained table loads
  * through bpeMergesFrom unchanged and tokenizes via the min-rank
  * loop.
  */
class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def train(corpus: Seq[String], k: Int,
                    minFreq: Long = 2L): Seq[(Long, String, String, Long)] =
    TextAnalysis.bpeTrainFromText(corpus.toDF("text"), "text", k, minFreq)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("hand-computed merges on a tiny corpus, rank order and counts") {
    // words: low(3), lower(2), lowest(2) — pair counts round 1:
    // (l,o)=7 (w? no: l-o in all 7), (o,w)=7, (w,e)=4, (e,r)=2,
    // (e,s)=2, (s,t)=2. Tie (l,o) vs (o,w) at 7 → lhs ASC picks (l,o).
    val corpus = Seq("low low low lower lower", "lowest lowest")
    val m = train(corpus, 3)
    assert(m(0) == ((0L, "l", "o", 7L)))
    // round 2: symbols now (lo,w,...): (lo,w)=7, (w,e)=4, ... → (lo,w)
    assert(m(1) == ((1L, "lo", "w", 7L)))
    // round 3: (low,e)=4 beats (e,r)=2/(e,s)=2/(s,t)=2
    assert(m(2) == ((2L, "low", "e", 4L)))
  }

  test("overlapping pairs all count — 'aaaa' contributes (a,a) three " +
    "times per occurrence — but merges apply leftmost non-overlapping") {
    // aaaa ×2 → (a,a) count 6 in round 1
    val m = train(Seq("aaaa aaaa"), 2)
    assert(m(0) == ((0L, "a", "a", 6L)))
    // after merge: aaaa → (aa)(aa): pairs (aa,aa)=2 per word → 2... per
    // corpus both words merge to [aa,aa]: (aa,aa) count 2
    assert(m(1) == ((1L, "aa", "aa", 2L)))
  }

  test("tie-break is (count DESC, lhs ASC, rhs ASC)") {
    // "ab" ×2 and "cd" ×2: (a,b)=2 and (c,d)=2 → (a,b) wins rank 0
    val m = train(Seq("ab ab cd cd"), 2)
    assert(m(0) == ((0L, "a", "b", 2L)))
    assert(m(1) == ((1L, "c", "d", 2L)))
  }

  test("early stop: no pair at or above minPairFreq ends training " +
    "short of numMerges") {
    // every word distinct and every pair unique → best count 1 < 2
    val m = train(Seq("ab cd ef"), 5)
    assert(m.isEmpty)
    // minFreq=1 learns them (deterministic alphabetical order)
    val m1 = train(Seq("ab cd ef"), 5, minFreq = 1L)
    assert(m1.map(r => (r._2, r._3)) ==
      Seq("a" -> "b", "c" -> "d", "e" -> "f"))
  }

  test("words shorter than 2 letters and non-letters never train") {
    val m = train(Seq("a b c 1 2 3 ?!", "x y z"), 3)
    assert(m.isEmpty)
  }

  test("trained table loads through bpeMergesFrom and tokenizes via " +
    "the min-rank loop — the train→load→apply composition") {
    val corpus = Seq(
      "the station is internal", "ingestion pipelines",
      "tion ation nation station", "banana bandana",
      "lower lowest low", "the theme thesis", "internal internet")
    val table = TextAnalysis.bpeTrainFromText(
      corpus.toDF("text"), "text", numMerges = 12)
    // loader validates: operands single letters or earlier outputs,
    // each output symbol new — the trainer must satisfy both
    val loaded = TextAnalysis.bpeMergesFrom(
      table, "lhs", "rhs", "merge_rank")
    assert(loaded.nonEmpty && loaded.length <= 12)
    // and the loaded rules tokenize: piece counts shrink vs chars
    for (t <- corpus) {
      val pieces = TextAnalysis.bpePieces(t, loaded)
      val letters = t.count(_.isLetter)
      assert(pieces > 0 && pieces < letters,
        s"pieces=$pieces letters=$letters on '$t'")
      // loop ≡ chain on the learned table too
      assert(pieces == TextAnalysis.bpePiecesChain(t, loaded))
    }
  }

  test("warm-start resume ≡ continued training: bpeTrain(n+k) == " +
    "bpeTrain(n) ++ resume(prior = first n, k) on an unchanged corpus") {
    val corpus = Seq(
      "the station is internal", "ingestion pipelines",
      "tion ation nation station", "banana bandana",
      "lower lowest low", "the theme thesis", "internal internet")
    val docs = corpus.toDF("text")
    val full = TextAnalysis.bpeTrainFromText(docs, "text", 9)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val prior = TextAnalysis.bpeMergesFrom(
      TextAnalysis.bpeTrainFromText(docs, "text", 6),
      "lhs", "rhs", "merge_rank")
    val resumed = TextAnalysis.bpeTrainResumeFromText(docs, "text",
        prior, 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(full.take(6).map(r => (r._2, r._3)) == prior)
    assert(resumed == full.drop(6))
    assert(resumed.map(_._1) == Seq(6L, 7L, 8L))
  }

  test("training is frequency-weighted: the (word,freq) form matches " +
    "the exploded-text form") {
    val words = Seq(("low", 3L), ("lower", 2L), ("lowest", 2L))
      .toDF("w", "f")
    val m = TextAnalysis.bpeTrain(words, "w", "f", 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    val m2 = train(Seq("low low low lower lower", "lowest lowest"), 3)
    assert(m == m2)
  }
}
