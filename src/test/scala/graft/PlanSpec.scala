package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Queries

/** Physical-plan regression tests: the properties that make these
  * plans survive a 100× scale-up, asserted so a refactor cannot
  * silently reintroduce a scale-killer (SCALE.md is the prose twin).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Queries.all(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02 dim enrichment broadcasts, never sort-merges the dims") {
    val p = plan("q02_enrich_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q12 global top-n plans TakeOrdered, not a full sort") {
    assert(plan("q12_union_priority").contains("TakeOrderedAndProject"))
  }

  test("q25 minhash banding has no cartesian or nested-loop join") {
    val p = plan("q25_minhash_lsh")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q22 inverted-index jaccard joins on the shingle, no cross join") {
    val p = plan("q22_ngram_jaccard")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q30 as-of join is one shuffle on the key (tagged-union window)") {
    val p = plan("q30_asof_join")
    // no join operator at all: the as-of is a union + window pass
    assert(!p.contains("Join"))
  }

  test("documents scan prunes to the projected columns only") {
    val p = plan("q17_tokens")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"expected pruned ReadSchema in:\n$p")
  }
}
