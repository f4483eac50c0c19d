package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Chunker, TextAnalysis}

/** Property tests for the G3 chunker contract (SURVEY.md §2.12 #9):
  * every chunk ≤ size (unless a single unsplittable run exceeds it),
  * no emitted chunk ≤ minLen, and full coverage of the source text.
  * (Raw ScalaCheck generators sampled with fixed seeds — the
  * scalatest-scalacheck bridge artifact isn't in the offline cache.)
  */
class ChunkerSpec extends AnyFunSuite {

  private val sentenceGen: Gen[String] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty))
    sep <- Gen.oneOf(". ", "! ", "? ", "\n\n")
  } yield ws.mkString(" ") + sep

  private val textGen: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, sentenceGen).map(_.mkString))

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("chunks respect size bound when text is separator-splittable") {
    samples(200).foreach { text =>
      Chunker.chunk(text, size = 100, overlap = 20).foreach { c =>
        assert(c.length <= 100 ||
          Chunker.DefaultSeps.forall(s => !c.contains(s)))
      }
    }
  }

  test("no emitted chunk is <= minLen chars") {
    samples(200).foreach { text =>
      Chunker.chunk(text, size = 100, overlap = 20, minLen = 10)
        .foreach(c => assert(c.length > 10))
    }
  }

  test("every word of the input appears in some chunk") {
    samples(200).foreach { text =>
      val chunks = Chunker.chunk(text, size = 100, overlap = 20, minLen = 0)
      val joined = chunks.mkString(" ")
      text.split("[\\s.!?]+").filter(_.nonEmpty).foreach { w =>
        assert(joined.contains(w), s"lost word: $w in <$text>")
      }
    }
  }

  test("hard character cut applies to unsplittable runs") {
    val text = "x" * 950
    val chunks = Chunker.chunk(text, size = 400, overlap = 50, minLen = 10)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 400))
    assert(chunks.map(_.length).sum >= 950 - 400) // coverage minus trims
  }

  test("empty and null input produce no chunks") {
    assert(Chunker.chunk("").isEmpty)
    assert(Chunker.chunk(null).isEmpty)
  }

  test("consecutive chunks share overlap context") {
    val sents = (1 to 40).map(i => s"sentence number $i with padding words. ")
    val text = sents.mkString
    val chunks = Chunker.chunk(text, size = 200, overlap = 40, minLen = 10)
    assert(chunks.length > 1)
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        val tail = a.takeRight(20).trim
        assert(tail.isEmpty || b.contains(tail.take(10)))
      case _ => ()
    }
  }

  test("enforceTokenLimit re-splits over-budget chunks with token " +
    "overlap; compliant chunks pass through untouched") {
    val small = "a b c"
    assert(Chunker.enforceTokenLimit(Seq(small), maxTokens = 10) ==
      Seq(small))
    val big = (1 to 100).map(i => s"t$i").mkString(" ")
    val out = Chunker.enforceTokenLimit(Seq(big), maxTokens = 40,
      tokenOverlap = 5)
    assert(out.length > 1)
    // every piece within 0.75·maxTokens; every token still present
    assert(out.forall(_.split("\\s+").length <= 30))
    val covered = out.flatMap(_.split("\\s+")).toSet
    assert(covered == big.split(" ").toSet)
    // consecutive pieces share the token overlap
    out.sliding(2).foreach {
      case Seq(a, b) =>
        val tail = a.split("\\s+").takeRight(5).toSeq
        assert(b.split("\\s+").take(5).toSeq == tail)
      case _ => ()
    }
  }

  test("enforceBpeTokenLimit budgets in BPE pieces: over-budget " +
    "chunks re-split until every piece fits; under-budget pass " +
    "through untouched; indivisible tokens don't loop") {
    import graft.operators.TextAnalysis
    val big = ("the internal station " * 120).trim // pieces >> ws tokens
    val small = "short text"
    val out = Chunker.enforceBpeTokenLimit(Seq(big, small),
      maxTokens = 100, tokenOverlap = 5)
    assert(out.contains(small))
    assert(out.length > 2, "over-budget chunk was not re-split")
    out.foreach { c =>
      assert(TextAnalysis.bpePieces(c) <= 100,
        s"piece over budget: ${TextAnalysis.bpePieces(c)}")
    }
    // every word survives somewhere (overlap windows lose nothing)
    val words = out.flatMap(_.split("\\s+")).toSet
    assert(words == big.split("\\s+").toSet ++ small.split("\\s+").toSet)
    // a single indivisible over-budget token passes through, no loop
    val one = "x" * 4000
    assert(Chunker.enforceBpeTokenLimit(Seq(one), 10) == Seq(one))
  }

  test("enforceBpeTokenLimit on piece-dense text (scaled window width " +
    "at or below the overlap) still loses no words") {
    import graft.operators.TextAnalysis
    // unique 12-char words outside the toy vocab: ~1 piece per char,
    // so the pieces-per-token scaling shrinks the window width well
    // below the 25-token overlap — the regime where the classic
    // `start + overlap < n` window cut silently dropped the tail
    val words = (0 until 120).map(i => f"zq${i}%04dvwxjkp")
    val dense = words.mkString(" ")
    val out = Chunker.enforceBpeTokenLimit(Seq(dense),
      maxTokens = 100, tokenOverlap = 25)
    out.foreach { c =>
      assert(TextAnalysis.bpePieces(c) <= 100,
        s"piece over budget: ${TextAnalysis.bpePieces(c)}")
    }
    assert(out.flatMap(_.split("\\s+")).toSet == words.toSet,
      "tail words were dropped by the window cut")
  }

  test("enforceBpeTokenLimit property: EVERY emitted multi-token chunk " +
    "is within budget (the width clamp leaves no over-budget " +
    "pass-through), across random piece-dense fixtures and budgets") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(71)
    // mix vocab words (few pieces) with numeric/punctuation junk
    // (pieces ≈ chars) so measured pieces-per-token varies wildly —
    // including marginally-over-budget chunks where the scaled width
    // lands at or near the chunk's own token count
    def word(): String = rnd.nextInt(3) match {
      case 0 => Seq("the", "internal", "station", "report",
        "of")(rnd.nextInt(5))
      case 1 => (0 until 2 + rnd.nextInt(10))
        .map(_ => rnd.nextInt(10)).mkString
      case _ => f"zq${rnd.nextInt(9999)}%04dvw"
    }
    for (_ <- 0 until 20) {
      val n = 2 + rnd.nextInt(200)
      val text = (0 until n).map(_ => word()).mkString(" ")
      val budget = 8 + rnd.nextInt(120)
      val out = Chunker.enforceBpeTokenLimit(Seq(text),
        maxTokens = budget, tokenOverlap = 1 + rnd.nextInt(30))
      out.foreach { c =>
        val toks = c.split("\\s+").filter(_.nonEmpty)
        if (toks.length > 1)
          assert(TextAnalysis.bpePieces(c) <= budget,
            s"multi-token chunk over budget $budget: '${c.take(60)}…' " +
              s"(${TextAnalysis.bpePieces(c)} pieces)")
      }
      assert(out.flatMap(_.split("\\s+")).toSet ==
        text.split("\\s+").toSet, "words lost in re-split")
    }
  }

  test("ChunkText Generator matches the typed flatMap formulation " +
    "and handles null/empty text") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, ("alpha beta. " * 60).trim),
      (2L, "short. "),
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val gen = rows(Chunker.chunkDF(docs, "doc_id", "text", 100, 20))
    val typed = rows(Chunker.chunkDFTyped(docs, "doc_id", "text", 100, 20))
    assert(gen == typed)
    assert(gen.nonEmpty)
    assert(!gen.exists(r => r._1 == 3L || r._1 == 4L)) // null/empty → 0 rows
  }

  test("bpeMergesFrom loads a rank-ordered merge table the built-in " +
    "toy lacks, and the loaded table changes piece counts end-to-end") {
    val s = SharedSpark.spark
    import s.implicits._
    // extend the toy table with merges it does NOT have: qu, ck, qu+i
    val extra = TextAnalysis.bpeMerges ++
      Seq("q" -> "u", "c" -> "k", "qu" -> "i")
    val df = extra.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("rank", "a", "b")
    val loaded = TextAnalysis.bpeMergesFrom(df, "a", "b", "rank")
    assert(loaded == extra)
    val text = "the quick quip"
    val builtin = TextAnalysis.bpePieces(text)
    val withExtra = TextAnalysis.bpePieces(text, loaded)
    // qu/ck/qui merges shrink "quick"→[qui,ck] and "quip"→[qui,p]
    assert(withExtra < builtin,
      s"loaded merges should reduce pieces: $withExtra vs $builtin")
    // column path agrees with the JVM twin under the loaded table
    val got = s.createDataset(Seq(text)).toDF("t")
      .select(TextAnalysis.bpePieceCount($"t", loaded)).head().getInt(0)
    assert(got == withExtra)
    // chunker budget takes the loaded table: a piece-dense string over
    // budget under the toy table fits under the extended one
    val dense = Seq.fill(30)("quick").mkString(" ")
    assert(TextAnalysis.bpePieces(dense) >
      TextAnalysis.bpePieces(dense, loaded))
    val limit = TextAnalysis.bpePieces(dense, loaded)
    assert(Chunker.enforceBpeTokenLimit(Seq(dense), limit,
      5, loaded) == Seq(dense))          // fits: passes through unsplit
    assert(Chunker.enforceBpeTokenLimit(Seq(dense), limit, 5)
      .length > 1)                       // toy table: over budget, split
  }

  test("bpeMergesFrom rejects malformed tables: over-cap, reserved " +
    "chars, and rules referencing never-produced symbols") {
    val s = SharedSpark.spark
    import s.implicits._
    val good = Seq((0L, "a", "b"), (1L, "ab", "c")).toDF("rank", "a", "b")
    assert(TextAnalysis.bpeMergesFrom(good, "a", "b", "rank") ==
      Seq("a" -> "b", "ab" -> "c"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergesFrom(good, "a", "b", "rank", maxMerges = 1)
    }
    intercept[IllegalArgumentException] {  // 'xy' never produced
      TextAnalysis.bpeMergesFrom(
        Seq((0L, "xy", "z")).toDF("rank", "a", "b"), "a", "b", "rank")
    }
    intercept[IllegalArgumentException] {  // reserved marker char
      TextAnalysis.bpeMergesFrom(
        Seq((0L, "<", "a")).toDF("rank", "a", "b"), "a", "b", "rank")
    }
    intercept[IllegalArgumentException] {  // NULL operand: throw, not drop
      TextAnalysis.bpeMergesFrom(
        Seq((0L, "a", "b"), (1L, null, "c"))
          .toDF("rank", "a", "b"), "a", "b", "rank")
    }
    intercept[IllegalArgumentException] {  // duplicate rank
      TextAnalysis.bpeMergesFrom(
        Seq((0L, "a", "b"), (0L, "b", "c"))
          .toDF("rank", "a", "b"), "a", "b", "rank")
    }
  }

  test("bpeMergesFromFile parses the merges.txt layout (header lines, " +
    "rank = line order) through the Hadoop filesystem") {
    val s = SharedSpark.spark
    val f = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.writeString(f,
      "#version: 0.2\nt h\nth e\n\nq u\n")
    try {
      val m = TextAnalysis.bpeMergesFromFile(s, f.toString)
      assert(m == Seq("t" -> "h", "th" -> "e", "q" -> "u"))
    } finally java.nio.file.Files.delete(f)
  }
}
