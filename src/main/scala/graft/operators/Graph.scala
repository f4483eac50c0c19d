package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for corpus curation. The canonical 100 TB
  * use is domain/page authority as a quality prior: crawl corpora
  * (C4/CCNet-style pipelines) weight or filter documents by the link
  * authority of their host, which is PageRank over the host graph.
  * The reference's data model has no link graph (its quality signal
  * is per-document validation, articles.py), so this is one of the
  * beyond-reference curation surfaces, next to perplexity filtering
  * (LangModel) and near-dup clustering (Dedup.resolveClusters).
  *
  * Execution shape, per power iteration: ONE shuffle — ranks join
  * edges on `src` (edges are hash-partitioned on `src` once, up
  * front, and every iteration's join reuses that exchange because the
  * rank side is re-partitioned to match), then the contribution sum
  * shuffles by `dst`. The dangling-node mass (rank parked on nodes
  * with no out-edges) is a ONE-ROW aggregate broadcast back into the
  * update — never a driver collect inside the loop, so the whole
  * run stays one lazy plan per iteration. Each iteration's ranks are
  * persisted and the previous iteration's unpersisted: without the
  * persist the lineage re-executes all prior iterations (exponential
  * blowup), which is THE classic iterative-Spark trap.
  */
object Graph {

  /** PageRank over `edges` restricted to the node universe `nodes`.
    *
    * Semantics (classic, with dangling redistribution): every node
    * starts at rank 1/N; each iteration
    * `r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)`
    * where `D` is the summed rank of dangling nodes (no out-edges).
    * Σ r stays exactly 1 per iteration, which DoubleSpec-style checks
    * can pin. Self-loops are dropped (a page linking to itself
    * contributes nothing in the classic formulation); parallel edges
    * are collapsed — an endorsement is counted once.
    *
    * `nodes` fixes the universe N independently of edge structure so
    * isolated nodes (no in- OR out-edges) still hold baseline rank —
    * deriving N from the edge list silently shrinks the universe when
    * a node's only edges are dropped self-loops.
    *
    * Returns (`node`, `rank`) for every node in `nodes`.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame,
               srcCol: String, dstCol: String,
               iterations: Int = 5, damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, nodes, srcCol, dstCol, None, iterations, damping)

  /** Warm-start PageRank — the incremental-maintenance form. After an
    * edge delta, the old ranks are already near the new fixed point
    * (power iteration contracts at rate `damping` per step), so
    * resuming from `prior` for 1-2 iterations replaces a full 5+-
    * iteration recompute: at 100 TB graph scale that is the
    * difference between touching every edge twice and five-plus
    * times. `prior` is (node, rank) from any earlier run; nodes new
    * to the universe start at 1/N, and the seed is renormalized to
    * total mass 1 in-plan (one broadcast aggregate) so the
    * conservation invariant survives node churn.
    */
  def pageRankResume(edges: DataFrame, nodes: DataFrame,
                     srcCol: String, dstCol: String, prior: DataFrame,
                     iterations: Int = 2,
                     damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, nodes, srcCol, dstCol, Some(prior), iterations,
      damping)

  private def pageRankImpl(edges: DataFrame, nodes: DataFrame,
                           srcCol: String, dstCol: String,
                           prior: Option[DataFrame],
                           iterations: Int, damping: Double): DataFrame = {
    require(iterations >= 1, "pageRank needs at least one iteration")

    val universe = nodes.select(col(nodes.columns.head).as("node"))
      .distinct()
    // one-row dimension: N as a broadcastable scalar kept in-plan
    val nDf = universe.agg(count(lit(1)).cast("double").as("n"))

    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      // co-locate every iteration's rank⋈edges probe on src once
      .repartition(col("src"))
      .persist()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("out_deg"))
      .persist()

    val seed = prior match {
      case None =>
        universe.crossJoin(broadcast(nDf))
          .select(col("node"), (lit(1.0) / col("n")).as("rank"))
      case Some(p) =>
        val cols = p.columns
        val projected = universe
          .join(p.select(col(cols(0)).as("node"),
            col(cols(1)).as("prior_rank")), Seq("node"), "left")
          .crossJoin(broadcast(nDf))
          .select(col("node"),
            coalesce(col("prior_rank"), lit(1.0) / col("n")).as("rank"))
        val mass = projected.agg(sum(col("rank")).as("mass"))
        projected.crossJoin(broadcast(mass))
          .select(col("node"), (col("rank") / col("mass")).as("rank"))
    }
    var ranks = seed.localCheckpoint()

    var i = 0
    while (i < iterations) {
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      // mass parked on dangling nodes, as a broadcast one-row agg
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .select(col("node").as("src"),
          (col("rank") / col("out_deg")).as("w"))
        .join(e, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w")).as("contrib"))
      val next = universe
        .join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .crossJoin(broadcast(nDf))
        .select(col("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) +
              col("dangling") / col("n"))).as("rank"))
        // localCheckpoint, not persist: each iteration's plan embeds
        // the previous one ~4× (contribs, dangling, the node join), so
        // lineage grows 4^k — the ANALYZER chokes long before the
        // executor does (a 7-iteration warm-start plan stringifies
        // to gigabytes). Truncating to the materialized RDD keeps
        // planning O(1) per iteration; the blocks are the same ones
        // persist would hold.
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
      i += 1
    }
    ranks
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for
    * community detection — the lightweight complement to
    * [[graft.operators.Dedup.resolveClusters]]: connected components
    * find REACHABILITY clusters, label propagation finds DENSITY
    * clusters (a weakly-connected pair of communities separates).
    * Corpus curation uses it to group near-dup neighborhoods and
    * topic clusters without training anything.
    *
    * Semantics, per synchronous round: every node adopts the most
    * frequent label among its neighbors (edges treated as undirected
    * — the union of both directions, deduped, self-loop-free), ties
    * broken by the SMALLEST label; isolated nodes keep their own.
    * Deterministic by construction — no async sweep, no random order
    * — so two engines agree round for round. Fixed `iterations`
    * rather than convergence detection: each round is ONE
    * neighbor-join shuffle + ONE (node, label) count shuffle, and at
    * scale you budget rounds, not fixpoints (labels stabilize in a
    * handful of rounds on community-structured graphs).
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       srcCol: String, dstCol: String,
                       iterations: Int = 4): DataFrame = {
    require(iterations >= 1, "labelPropagation needs >= 1 iteration")
    val universe = nodes.select(col(nodes.columns.head).as("node"))
      .distinct()
    val directed = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = directed
      .unionByName(directed.select(col("dst").as("src"),
        col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()

    var labels = universe.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var i = 0
    while (i < iterations) {
      val counts = und.withColumnRenamed("src", "node")
        .join(labels, Seq("node"))
        .select(col("dst").as("node"), col("label"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("label").asc)
      val winners = counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node"), col("label").as("new_label"))
      val next = labels
        .join(winners, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
        // lineage cut per round — see pageRankImpl's note
        .localCheckpoint()
      labels.unpersist()
      labels = next
      i += 1
    }
    labels
  }

  /** In-/out-degree per node over the deduped, self-loop-free edge
    * view `pageRank` ranks on — the companion diagnostic (authority
    * queries usually report rank next to degree).
    */
  def degrees(edges: DataFrame, nodes: DataFrame,
              srcCol: String, dstCol: String): DataFrame = {
    val universe = nodes.select(col(nodes.columns.head).as("node"))
      .distinct()
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    universe
      .join(e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("out_deg")), Seq("node"), "left")
      .join(e.groupBy(col("dst").as("node"))
        .agg(count(lit(1)).as("in_deg")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
