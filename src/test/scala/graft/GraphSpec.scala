package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank invariants: mass conservation, the uniform-cycle closed
  * form, dangling redistribution, and a hand-checkable 3-node chain.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
                      iters: Int = 5): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), nodes.toDF("node"),
        "src", "dst", iterations = iters)
      .as[(Long, Double)].collect().toMap

  test("rank mass sums to 1 every run, dangling or not") {
    val cycle = ranksOf(Seq((0L, 1L), (1L, 2L), (2L, 0L)), Seq(0L, 1L, 2L))
    assert(math.abs(cycle.values.sum - 1.0) < 1e-12)
    // node 2 dangles: its mass must be redistributed, not lost
    val dang = ranksOf(Seq((0L, 1L), (1L, 2L)), Seq(0L, 1L, 2L))
    assert(math.abs(dang.values.sum - 1.0) < 1e-12)
  }

  test("a uniform cycle is the fixed point: every rank = 1/N") {
    val n = 6L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val r = ranksOf(edges, 0L until n, iters = 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
  }

  test("3-node chain matches the hand-computed iteration") {
    // 0→1, 1→2, 2 dangling; d=0.85, N=3, one iteration from uniform:
    // dangling D=1/3; base=(0.15/3)+0.85·(1/9)=0.05+0.0944…
    val r = ranksOf(Seq((0L, 1L), (1L, 2L)), Seq(0L, 1L, 2L), iters = 1)
    val base = 0.15 / 3 + 0.85 * (1.0 / 3 / 3)
    assert(math.abs(r(0L) - base) < 1e-12)
    assert(math.abs(r(1L) - (base + 0.85 / 3)) < 1e-12)
    assert(math.abs(r(2L) - (base + 0.85 / 3)) < 1e-12)
    // in-link beats no in-link once ranks separate
    val r5 = ranksOf(Seq((0L, 1L), (1L, 2L)), Seq(0L, 1L, 2L))
    assert(r5(2L) > r5(0L) && r5(1L) > r5(0L))
  }

  test("self-loops and parallel edges do not change the result") {
    val clean = ranksOf(Seq((0L, 1L), (1L, 0L), (1L, 2L)), Seq(0L, 1L, 2L))
    val noisy = ranksOf(
      Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 0L), (1L, 2L), (2L, 2L)),
      Seq(0L, 1L, 2L))
    clean.foreach { case (k, v) => assert(math.abs(noisy(k) - v) < 1e-12) }
  }

  test("isolated nodes keep baseline rank and widen N") {
    val r = ranksOf(Seq((0L, 1L)), Seq(0L, 1L, 2L, 3L))
    // 2 and 3 have no in-edges: rank = (1-d)/N + d·D/N each iteration
    assert(r(2L) == r(3L))
    assert(r(1L) > r(2L))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("pageRankResume from a 5-iter prior ≡ 7 cold iterations " +
      "(modulo the seed renormalization ulp)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val prior = Graph.pageRank(edges.toDF("src", "dst"),
      nodes.toDF("node"), "src", "dst", iterations = 5)
    val warm = Graph.pageRankResume(edges.toDF("src", "dst"),
        nodes.toDF("node"), "src", "dst", prior, iterations = 2)
      .as[(Long, Double)].collect().toMap
    val cold = ranksOf(edges, nodes, iters = 7)
    cold.foreach { case (k, v) =>
      assert(math.abs(warm(k) - v) < 1e-12, s"node $k")
    }
  }

  test("pageRankResume handles node churn: new node seeds at 1/N, " +
      "mass stays 1") {
    val prior = Graph.pageRank(Seq((0L, 1L)).toDF("src", "dst"),
      Seq(0L, 1L).toDF("node"), "src", "dst", iterations = 3)
    val warm = Graph.pageRankResume(
        Seq((0L, 1L), (2L, 1L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("node"), "src", "dst", prior,
        iterations = 1)
      .as[(Long, Double)].collect().toMap
    assert(warm.keySet == Set(0L, 1L, 2L))
    assert(math.abs(warm.values.sum - 1.0) < 1e-12)
    // node 1 keeps both in-links; the newcomer has none
    assert(warm(1L) > warm(2L))
  }

  test("labelPropagation: disjoint triangles converge to their min " +
      "label; isolated nodes keep their own") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (5L, 6L), (6L, 7L), (7L, 5L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 5L, 6L, 7L, 9L).toDF("node")
    val labels = Graph.labelPropagation(edges, nodes, "src", "dst",
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(labels(0L) == 0L && labels(1L) == 0L && labels(2L) == 0L)
    assert(labels(5L) == 5L && labels(6L) == 5L && labels(7L) == 5L)
    assert(labels(9L) == 9L) // isolated: keeps its own label
  }

  test("labelPropagation treats edges as undirected and is " +
      "deterministic across runs") {
    // star given only outward direction: leaves still see the hub
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
    val a = Graph.labelPropagation(edges, nodes, "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.labelPropagation(edges, nodes, "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // every leaf's only neighbor is the hub: leaves carry the hub's
    // (round-dependent) label, never each other's
    assert(a(1L) == a(2L) && a(2L) == a(3L))
  }

  test("degrees counts the deduped self-loop-free view") {
    val rows = Graph.degrees(
        Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 2L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("node"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq((0L, 1L, 0L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }
}
