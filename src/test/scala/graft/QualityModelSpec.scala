package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{QualityModel, TextAnalysis}

/** Learned quality filter: distillation agreement with the heuristic
  * teacher, the explicit-label seam, margin/SQL parity, and the
  * scan-side plan shape.
  */
class QualityModelSpec extends AnyFunSuite {

  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def corpus = {
    val good = (0 until 40).map(i =>
      (i.toLong, ("the quick brown fox jumps over a lazy dog and " +
        s"runs to the old mill pond near town number $i ") * 4))
    val bad = (40 until 80).map(i =>
      (i.toLong, s"x$i x$i x$i x$i"))
    (good ++ bad).toDF("doc_id", "text")
  }

  test("distilled linear model agrees with the heuristic teacher on " +
    "a separable corpus") {
    val docs = corpus
    val m = QualityModel.fit(docs, "text")
    val scored = QualityModel.score(m, docs, "doc_id", "text")
      .join(docs.select($"doc_id",
        (TextAnalysis.qualityScore($"text") >= 0.5).as("teacher")),
        Seq("doc_id"))
    val agree = scored.filter($"kept" === $"teacher").count()
    val total = scored.count()
    assert(agree >= (total * 0.9).toLong,
      s"distillation agreement $agree/$total")
    // both classes actually occur — the fit saw a real boundary
    val kept = scored.filter($"kept").count()
    assert(kept > 0 && kept < total)
  }

  test("fitOnLabels is the real-teacher seam: a label column the " +
    "features separate is recovered") {
    val docs = corpus.withColumn("judge",
      (TextAnalysis.wsTokenCount($"text") >= 20).cast("int"))
    val m = QualityModel.fitOnLabels(docs, "text", "judge")
    val scored = QualityModel.score(m, docs, "doc_id", "text")
      .join(docs.select($"doc_id", ($"judge" === 1).as("want")),
        Seq("doc_id"))
    val agree = scored.filter($"kept" === $"want").count()
    assert(agree >= (scored.count() * 0.9).toLong)
  }

  test("margin column ≡ hand-computed dot product, and kept is its " +
    "sign") {
    val m = QualityModel.LrModel(Array(2.0, -1.0, 0.5), -0.25)
    val rows = QualityModel.score(m, corpus, "doc_id", "text")
      .join(corpus.select($"doc_id",
        array(QualityModel.featureCols($"text"): _*).as("f")),
        Seq("doc_id"))
      .collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("f"))
      val z = -0.25 + 2.0 * f(0) + -1.0 * f(1) + 0.5 * f(2)
      assert(r.getDouble(r.fieldIndex("margin")) ==
        math.floor(z * 1000000.0 + 0.5) / 1000000.0)
      assert(r.getBoolean(r.fieldIndex("kept")) == (z >= 0.0))
    }
  }

  test("scoring is scan-side: no shuffle, no join in the plan") {
    val m = QualityModel.LrModel(Array(1.0, 1.0, 1.0), 0.0)
    val p = QualityModel.score(m, corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }
}
