package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize

/** The iterCut frame registry's lifecycle contract: deterministic
  * release for harness callers (releaseAll), and WEAK tracking so a
  * library caller who drops the last reference to a pageRank/hits/
  * labelPropagation result without ever calling releaseAll does not
  * have the registry pin the frame (and its checkpoint blocks'
  * GC-path reclamation) forever.
  */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  // allocate in a helper so no test-method local retains the frame
  private def makeAndDrop(): Unit = {
    import spark.implicits._
    val df = Materialize.iterCut(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
  }

  test("dropping the last reference to an iterCut frame shrinks " +
    "trackedCount under GC — no releaseAll needed") {
    spark // force session init before counting
    Materialize.releaseAll(spark)
    val before = Materialize.trackedCount
    makeAndDrop()
    assert(Materialize.trackedCount == before + 1)
    var tries = 0
    while (Materialize.trackedCount > before && tries < 100) {
      System.gc(); Thread.sleep(20); tries += 1
    }
    assert(Materialize.trackedCount == before,
      "weakly-tracked frame must be collectable without releaseAll")
  }

  test("releaseAll still frees blocks deterministically and empties " +
    "the registry") {
    import spark.implicits._
    Materialize.releaseAll(spark)
    val pre = spark.sparkContext.getPersistentRDDs.size
    val df = Materialize.iterCut(Seq(1, 2, 3, 4).toDF("x"))
    assert(df.count() == 4)
    assert(spark.sparkContext.getPersistentRDDs.size > pre)
    assert(Materialize.trackedCount >= 1)
    Materialize.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.size == pre)
    assert(Materialize.trackedCount == 0)
  }
}
