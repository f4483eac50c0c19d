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

  test("edges with an endpoint outside the node universe are dropped " +
      "entirely: no out-degree inflation, no mass leak") {
    // 1→5 (dst outside) and 7→0 (src outside) must not exist: if 1→5
    // merely had its contribution dropped post-hoc, node 1's
    // out-degree would still count it and Σrank < 1
    val noisy = ranksOf(Seq((0L, 1L), (1L, 5L), (7L, 0L)),
      Seq(0L, 1L, 2L))
    val clean = ranksOf(Seq((0L, 1L)), Seq(0L, 1L, 2L))
    assert(math.abs(noisy.values.sum - 1.0) < 1e-12)
    clean.foreach { case (k, v) => assert(math.abs(noisy(k) - v) < 1e-12) }
    // labelPropagation: out-of-universe endpoints must not shape votes
    val lp = Graph.labelPropagation(
        Seq((0L, 1L), (1L, 9L), (9L, 2L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("node"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(lp(2L) == 2L) // 2's only edge routes through 9 (outside)
    // degrees ignores them too
    val d = Graph.degrees(Seq((0L, 1L), (1L, 5L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("node"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(d == Set((0L, 1L, 0L), (1L, 0L, 1L), (2L, 0L, 0L)))
  }

  test("resilient materialize mode (persist/checkpoint) ≡ local mode " +
      "for pageRank, pageRankResume and labelPropagation") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    def run() = {
      val pr = ranksOf(edges, nodes, iters = 3)
      val prior = Graph.pageRank(edges.toDF("src", "dst"),
        nodes.toDF("node"), "src", "dst", iterations = 3)
      val warm = Graph.pageRankResume(edges.toDF("src", "dst"),
          nodes.toDF("node"), "src", "dst", prior, iterations = 2)
        .as[(Long, Double)].collect().toMap
      val lp = Graph.labelPropagation(edges.toDF("src", "dst"),
          nodes.toDF("node"), "src", "dst", 3)
        .as[(Long, Long)].collect().toMap
      (pr, warm, lp)
    }
    val local = run()
    spark.conf.set(graft.operators.Materialize.ModeKey, "resilient")
    try {
      // no checkpoint dir → replicated eager persist fallback
      assert(run() == local)
      val cpDir = java.nio.file.Files
        .createTempDirectory("graft-graph-cp").toString
      spark.sparkContext.setCheckpointDir(cpDir)
      try {
        // reliable checkpoint path — the 100 TB cluster configuration
        assert(run() == local)
      } finally spark.sparkContext.setCheckpointDir(null)
    } finally spark.conf.unset(graft.operators.Materialize.ModeKey)
  }

  test("personalizedPageRank: restart mass sits on the seed set and " +
      "matches the hand-computed iterations") {
    def ppr(iters: Int): Map[Long, Double] =
      Graph.personalizedPageRank(
          Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"),
          Seq(0L, 1L, 2L).toDF("node"), "src", "dst",
          Seq(0L).toDF("node"), iterations = iters)
        .as[(Long, Double)].collect().toMap
    // start r0 = t = (1,0,0); chain 0→1→2, 2 dangling
    val r1 = ppr(1)
    assert(math.abs(r1(0L) - 0.15) < 1e-12)
    assert(math.abs(r1(1L) - 0.85) < 1e-12)
    assert(math.abs(r1(2L) - 0.0) < 1e-12)
    val r2 = ppr(2)
    assert(math.abs(r2(1L) - 0.85 * 0.15) < 1e-12)
    assert(math.abs(r2(2L) - 0.85 * 0.85) < 1e-12)
    // iteration 3 exercises dangling→teleport redistribution: all of
    // node 2's mass restarts at the seed, none leaks uniformly
    val r3 = ppr(3)
    assert(math.abs(r3(0L) - (0.15 + 0.85 * 0.7225)) < 1e-12)
    assert(math.abs(r3.values.sum - 1.0) < 1e-12)
  }

  test("personalizedPageRank: weighted edges split contribution by " +
      "out-weight; parallel weighted edges sum; seed weights shape t") {
    val nodes = Seq(0L, 1L, 2L).toDF("node")
    // 0→1 carries 3× the weight of 0→2 (split as parallel edges to
    // pin the sum-not-collapse rule); uniform teleport via all-seeds
    val w = Graph.personalizedPageRank(
        Seq((0L, 1L, 2.0), (0L, 1L, 1.0), (0L, 2L, 1.0))
          .toDF("src", "dst", "w"),
        nodes, "src", "dst", Seq(0L, 1L, 2L).toDF("node"),
        iterations = 1, weightCol = Some("w"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-12)
    // contribution into 1 is 3× that into 2 (net of the common base)
    val base = w(0L) // node 0 gets no contribution: pure base
    assert(math.abs((w(1L) - base) / (w(2L) - base) - 3.0) < 1e-9)
    // seed weights: t = (0.75, 0.25, 0); out-of-universe seed ignored
    val s = Graph.personalizedPageRank(
        Seq((2L, 0L)).toDF("src", "dst"), nodes, "src", "dst",
        Seq((0L, 3.0), (1L, 1.0), (99L, 5.0)).toDF("node", "tw"),
        iterations = 1)
      .as[(Long, Double)].collect().toMap
    // r0 = t = (0.75, 0.25, 0); nodes 0 and 1 dangle so D = 1 and the
    // update collapses to r1 = 0.15·t + 0.85·(0 + 1·t) = t exactly
    assert(math.abs(s(0L) - 0.75) < 1e-12)
    assert(math.abs(s(1L) - 0.25) < 1e-12)
    assert(math.abs(s(2L) - 0.0) < 1e-12)
  }

  test("personalizedPageRankResume from an n-iter prior ≡ n+2 cold " +
      "personalized iterations (modulo seed renormalization ulp)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val seeds = Seq(0L, 3L)
    def cold(iters: Int) =
      Graph.personalizedPageRank(edges.toDF("src", "dst"),
          nodes.toDF("node"), "src", "dst", seeds.toDF("node"),
          iterations = iters)
    val warm = Graph.personalizedPageRankResume(edges.toDF("src", "dst"),
        nodes.toDF("node"), "src", "dst", seeds.toDF("node"), cold(3),
        iterations = 2)
      .as[(Long, Double)].collect().toMap
    val full = cold(5).as[(Long, Double)].collect().toMap
    full.foreach { case (k, v) =>
      assert(math.abs(warm(k) - v) < 1e-12, s"node $k")
    }
    assert(math.abs(warm.values.sum - 1.0) < 1e-12)
  }

  test("labelPropagation with edge weights: a heavy tie outvotes a " +
      "heavier count; unweighted stays the classic deduped vote") {
    // node 3's neighbors: 1 and 2 (label 1, 2 after round 1? use one
    // round). Weighted: edge 3-2 carries weight 5 vs two parallel
    // 3-1 edges at weight 1 each (sum 2) → 3 adopts label 2.
    val e = Seq((3L, 1L, 1.0), (3L, 1L, 1.0), (3L, 2L, 5.0))
      .toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val weighted = Graph.labelPropagation(e, nodes, "src", "dst",
        iterations = 1, weightCol = Some("w"))
      .as[(Long, Long)].collect().toMap
    assert(weighted(3L) == 2L)
    // unweighted: parallel edges collapse — one neighbor each, tie →
    // smallest label wins
    val unweighted = Graph.labelPropagation(e, nodes, "src", "dst",
        iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(unweighted(3L) == 1L)
  }

  test("personalizedPageRank requires an in-universe seed") {
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(Seq((0L, 1L)).toDF("src", "dst"),
        Seq(0L, 1L).toDF("node"), "src", "dst",
        Seq(9L).toDF("node"))
    }
  }

  test("degrees counts the deduped self-loop-free view") {
    val rows = Graph.degrees(
        Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 2L)).toDF("src", "dst"),
        Seq(0L, 1L, 2L).toDF("node"), "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(rows == Seq((0L, 1L, 0L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("hits: the directory page is the hub, its targets the " +
    "authorities, scores L1-normalize, isolated nodes hold zero") {
    // 0 → {1,2,3}; 4 → {1}; 5 isolated — node 0 points at all the
    // authorities so it must out-hub node 4; 1 collects two hubs
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val nodes = (0L to 5L).toDF("node")
    val out = Graph.hits(edges, nodes, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    val eps = 1e-12
    // L1 normalization on both score vectors
    assert(math.abs(out.values.map(_._1).sum - 1.0) < eps)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < eps)
    // node 0 dominates hubs; node 1 dominates authorities
    assert(out(0L)._1 > out(4L)._1 && out(4L)._1 > 0.0)
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 == out(3L)._2)
    // pure hubs have zero authority; pure authorities zero hub;
    // the isolated node holds zero on both
    assert(out(0L)._2 == 0.0 && out(1L)._1 == 0.0)
    assert(out(5L) == (0.0, 0.0))
    // deterministic across runs
    val again = Graph.hits(edges, nodes, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    assert(again == out)
  }

  test("pageRankResiduals: ranks unchanged, one residual per " +
    "iteration, monotone contraction at rate ≈ damping") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L),
      (2L, 3L)).toDF("src", "dst")
    val nodes = (0L to 3L).toDF("node")
    val iters = 6
    val (ranks, resid) = Graph.pageRankResiduals(
      edges, nodes, "src", "dst", iterations = iters)
    // instrumented run returns bit-identical ranks to the plain run
    val plain = Graph.pageRank(edges, nodes, "src", "dst",
      iterations = iters).as[(Long, Double)].collect().toMap
    ranks.as[(Long, Double)].collect().foreach { case (k, v) =>
      assert(v == plain(k), s"node $k")
    }
    val rs = resid.orderBy("iteration").as[(Int, Double)].collect()
    assert(rs.map(_._1).toSeq == (1 to iters))
    assert(rs.forall(_._2 >= 0.0))
    // power iteration contracts: each L1 delta ≤ damping × previous
    // (allow an ulp of slack — the bound is |PR| ≤ d in L1 norm)
    rs.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(b <= a * 0.85 + 1e-12, s"no contraction: $a -> $b")
    }
    // deltas are non-trivial for the first step (not all zeros)
    assert(rs.head._2 > 1e-6)
  }

  test("Materialize.releaseAll drops every iterCut frame a graph " +
    "query stranded: persistent-RDD count returns to pre-query level") {
    import graft.operators.Materialize
    Materialize.releaseAll(spark) // clean slate from earlier tests
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = (0L to 2L).toDF("node")
    val pr = Graph.pageRank(edges, nodes, "src", "dst", iterations = 4)
    pr.count() // consume: the final iterCut frame is now persisted
    val h = Graph.hits(edges, nodes, "src", "dst", iterations = 3)
    h.count()
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "expected the final frames to be persisted before release")
    Materialize.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "releaseAll must return block-manager state to pre-query level")
    // idempotent: a second pass is a no-op, not an error
    Materialize.releaseAll(spark)
  }
}
