package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Native codegen'd vector expressions vs their HOF cross-check twins,
  * plus SQL registration via GraftExtensions.
  */
class VectorExprSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => (Array.fill(dim)(rnd.nextFloat() * 2 - 1),
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("native dot/cosine are bit-identical to the HOF formulation") {
    val df = randVecs(50, 64, 11L).toDF("a", "b")
    val out = df.select(
      Vectors.dot($"a", $"b").as("d"), Vectors.dotHof($"a", $"b").as("dh"),
      Vectors.cosine($"a", $"b").as("c"),
      Vectors.cosineHof($"a", $"b").as("ch")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // same summation order
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("native cosine: zero-norm → null, mixed float/double inputs") {
    val df = Seq((Array(0f, 0f), Array(1.0, 2.0))).toDF("a", "b")
    val out = df.select(Vectors.cosine($"a", $"b").as("c")).collect()
    assert(out(0).isNullAt(0))
    val ok = Seq((Array(1f, 0f), Array(1.0, 0.0))).toDF("a", "b")
      .select(Vectors.cosine($"a", $"b")).head.getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
  }

  test("native expressions null the result on null array elements, " +
    "matching the HOF twins") {
    val out = spark.sql(
      """SELECT graft_dot(array(1.0D, NULL), array(1.0D, 2.0D)) AS d,
        |       graft_cosine(array(1.0D, NULL), array(1.0D, 2.0D)) AS c
        |""".stripMargin).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
    val hof = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(Vectors.dotHof($"a", $"b").as("d"),
        Vectors.cosineHof($"a", $"b").as("c")).head()
    assert(hof.isNullAt(0) && hof.isNullAt(1))
  }

  test("graft_cosine / graft_dot are callable from SQL via extensions") {
    val out = spark.sql(
      """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 1.0F)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin)
      .head()
    assert(math.abs(out.getDouble(0) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(out.getDouble(1) == 11.0)
  }

  test("nearestCells: NaN vector → null, not a crash") {
    // NaN makes every centroid distance NaN, so no candidate is ever
    // "nearest" — the kernel must honor the null contract instead of
    // indexing with best = -1
    val model = graft.operators.Similarity.IvfModel(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val df = Seq(Array(Double.NaN, 1.0), Array(0.1, 0.1)).toDF("v")
      .select(model.nearestCells($"v", 1).as("cells"))
    val out = df.collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Int](0) == Seq(0))
  }

  test("graft_chunk generator is callable from SQL") {
    val out = spark.sql(
      "SELECT chunk_idx, chunk FROM (SELECT 'one two. three four. five " +
        "six. seven eight.' AS t) LATERAL VIEW graft_chunk(t, 20, 5) " +
        "AS chunk_idx, chunk")
      .collect()
    assert(out.length > 1)
    assert(out.forall(_.getString(1).length <= 20))
  }
}
