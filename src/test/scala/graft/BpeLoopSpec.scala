package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.BpePieceCount
import graft.operators.TextAnalysis

/** Pins the min-rank merge loop (graft.expressions.BpePieceCount) ≡
  * the rank-ascending replace chain on every table bpeMergesFrom
  * admits — the equivalence that lets loaded GPT-2-scale tables run
  * through the O(len·log len) loop while oracled queries keep the
  * SQL-mirrorable chain form — and exercises the loop on a ≥5k-merge
  * synthetic table the chain's Column form could never build (a
  * 5k-deep Catalyst expression tree).
  */
class BpeLoopSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "the station is internal", "The, AND! 42", "", "a", "t h",
    "<<<>>>", "aaaa", "aaa", "banana bandana", "ingestion pipelines",
    "tion ation nation station", "thethethe", "xyzzy qwrt",
    "sphinx of black quartz judge my vow",
    "đây là tiếng việt with mixed scripts", "a1b2c3d4",
    "supercalifragilisticexpialidocious", "up down up down")

  test("loop ≡ chain on the built-in toy table over a varied corpus, " +
    "and the JVM bpePieces now IS the loop") {
    for (t <- corpus) {
      val chain = TextAnalysis.bpePiecesChain(t)
      val loop = TextAnalysis.bpePieces(t)
      assert(loop == chain, s"loop=$loop chain=$chain on '$t'")
    }
    // Column loop path ≡ Column chain path on the toy table too
    val chainCol = corpus.toDF("x")
      .select(TextAnalysis.bpePieceCount($"x")).as[Int].collect().toSeq
    val loopCol = corpus.toDF("x")
      .select(TextAnalysis.bpePieceCountLoop($"x")).as[Int].collect().toSeq
    assert(loopCol == chainCol)
  }

  test("loop ≡ chain on RANDOM tables satisfying bpeMergesFrom's " +
    "validated properties (operands single-char-or-earlier-output, " +
    "outputs new)") {
    val rnd = new scala.util.Random(1405)
    for (trial <- 0 until 20) {
      // grow a random valid table: operands drawn from letters +
      // previously-produced symbols, outputs required new
      val produced = scala.collection.mutable.LinkedHashSet[String]()
      val letters = ('a' to 'f').map(_.toString)
      val rules = Seq.newBuilder[(String, String)]
      var guard = 0
      while (produced.size < 40 && guard < 4000) {
        guard += 1
        def operand(): String = {
          val pool = letters ++ produced.toSeq
          pool(rnd.nextInt(pool.length))
        }
        val (a, b) = (operand(), operand())
        if (!produced.contains(a + b)) {
          produced += a + b
          rules += a -> b
        }
      }
      val table = rules.result()
      // random strings over the small alphabet make merges dense
      val strings = (0 until 30).map { _ =>
        (0 until (1 + rnd.nextInt(24)))
          .map(_ => letters(rnd.nextInt(letters.length))).mkString ++
          (if (rnd.nextBoolean()) " " + letters(rnd.nextInt(6)) * 3 else "")
      }
      for (s <- strings) {
        val chain = TextAnalysis.bpePiecesChain(s, table)
        val loop = TextAnalysis.bpePieces(s, table)
        assert(loop == chain,
          s"trial $trial: loop=$loop chain=$chain on '$s' table=$table")
      }
    }
  }

  test("a 5000+-merge loaded-scale table runs through the loop Column " +
    "path (constant expression depth) and matches the JVM chain — the " +
    "table size the replace-chain expression tree cannot reasonably " +
    "build") {
    // deterministic well-formed big table: all letter pairs (676),
    // then len-3 symbols from (len-2 output, letter) — 5200 rules
    val letters = ('a' to 'z').map(_.toString)
    val len2 = for (x <- letters; y <- letters) yield (x, y)
    val len3 = (for (xy <- len2.map(p => p._1 + p._2); z <- letters)
      yield (xy, z)).take(5200 - len2.length)
    val big = len2 ++ len3
    assert(big.length >= 5000)
    // the validator admits it (well-formed by construction)
    val loaded = TextAnalysis.bpeMergesFrom(
      big.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "a", "b"),
      "a", "b", "rank", maxMerges = 6000)
    assert(loaded.length == big.length)

    val texts = Seq("the quick brown fox", "aa bb cc dd", "zzz top",
      "abcdef ghijkl", "a", "", "mixed 123 separators!")
    // bpePieceCount AUTO-ROUTES above chainMaxMerges to the loop expr
    val auto = texts.toDF("x")
      .select(TextAnalysis.bpePieceCount($"x", loaded)).as[Int]
      .collect().toSeq
    // ground truth: the JVM replace chain (5200 passes × short strings
    // is fine HERE; as a Catalyst tree it would be a 5200-deep plan)
    val chain = texts.map(t => TextAnalysis.bpePiecesChain(t, loaded))
    assert(auto == chain)
    // and the plan really is the constant-depth native expression,
    // not a replace chain (non-foldable input so the optimizer can't
    // constant-fold the expression away before we look at it)
    val plan = spark.range(1)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("the quick "),
        $"id".cast("string")).as("x"))
      .select(TextAnalysis.bpePieceCount($"x", loaded))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bpe_piece_count"), plan)
    assert(!plan.contains("replace("), "big table must not build a chain")
  }

  test("toy-sized tables keep the chain Column form (the oracle-" +
    "mirrorable shape q119 pins), and the SQL form refuses " +
    "loaded-scale tables") {
    val plan = spark.range(1)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("the quick "),
        $"id".cast("string")).as("x"))
      .select(TextAnalysis.bpePieceCount($"x"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("replace("), plan)
    assert(!plan.contains("graft_bpe_piece_count"), plan)
    val big = (0 until 200).map { i =>
      // valid incremental chain a, ab, abb, abbb… (outputs all new)
      (if (i == 0) "a" else "a" + "b" * i, "b")
    }
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bpePieceCountSql("text", big)
    }
    assert(ex.getMessage.contains("chain-mode"))
  }

  test("bpeMergesFrom rejects duplicate-output tables (the case that " +
    "breaks chain/loop equivalence: a later rule re-producing an " +
    "earlier output can re-create an already-passed pair)") {
    // ('a','b')→ab, ('ab','c')→abc, ('b','c')→bc, ('a','bc')→abc ←dup
    val dup = Seq((0L, "a", "b"), (1L, "ab", "c"), (2L, "b", "c"),
      (3L, "a", "bc")).toDF("rank", "a", "b")
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergesFrom(dup, "a", "b", "rank")
    }
    assert(ex.getMessage.contains("re-produces"))
  }

  test("enforceBpeTokenLimit budgets via the loop with a loaded-scale " +
    "table: every emitted chunk is within budget, coverage holds") {
    val letters = ('a' to 'z').map(_.toString)
    val big = (for (x <- letters; y <- letters) yield (x, y)) ++
      (for (x <- letters; y <- letters; z <- Seq("a", "e", "i"))
        yield (x + y, z))
    assert(big.length > TextAnalysis.chainMaxMerges)
    val text = (0 until 400)
      .map(i => "chunk" + (i % 7) + " stationable winding")
      .mkString(" ")
    val out = graft.operators.Chunker.enforceBpeTokenLimit(
      Seq(text), maxTokens = 80, tokenOverlap = 5, merges = big)
    assert(out.nonEmpty)
    out.foreach { c =>
      assert(TextAnalysis.bpePieces(c, big) <= 80,
        s"over budget: ${TextAnalysis.bpePieces(c, big)}")
    }
    // coverage: every input token appears in some output chunk
    val outToks = out.flatMap(_.split("\\s+")).toSet
    text.split("\\s+").foreach(t => assert(outToks.contains(t)))
  }
}
