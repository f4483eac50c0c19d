package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a text corpus — the lexical half of a
  * retrieval stack (the reference's vector path covers the semantic
  * half; qdrant_io_manager.py:33). Okapi BM25 with the Lucene-shaped
  * non-negative idf, ln(1 + (N - df + 0.5)/(df + 0.5)) (Robertson &
  * Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
  * FnTIR 2009).
  *
  * Scale shape (the inverted-index probe, relationally):
  *  - tokenize + explode is ONE corpus scan; the query-term filter is
  *    applied AT the explode (an `isin` over a literal list, pushed
  *    into the generate), so only postings for query terms survive —
  *    the analog of seeking |q| posting lists, not scanning the vocab;
  *  - tf is a map-side-combined hash aggregate on (doc, term); df
  *    aggregates the tf table (tiny: ≤ |q| rows out), and rides back
  *    in via a broadcast join keyed on term;
  *  - corpus stats (N, avgdl) are a single scalar aggregate broadcast
  *    by a cross join — no driver collect;
  *  - the final top-k is a global TakeOrdered (orderBy + limit), not a
  *    full sort.
  * Scores are quantized to 6 decimals (floor(x·10⁶ + 0.5)/10⁶ on both
  * engines) BEFORE ranking so float-sum-order noise can never flip a
  * rank across engines; ties break by doc id.
  */
object Retrieval {

  /** Whitespace tokenization shared with TextAnalysis/Dedup/LangModel:
    * lowercase, split on runs of whitespace, drop empties. NULL text
    * yields an EMPTY array, not null — so `size(...)` is 0 (never the
    * SQL-legacy −1) and downstream token counts / document lengths
    * stay sane for null-text rows.
    */
  def tokens(text: Column): Column =
    coalesce(array_remove(split(lower(text), "\\s+"), ""),
      array().cast("array<string>"))

  /** Top-`k` documents for `queryTerms` by BM25. Output:
    * (rank, doc_id, score) — score quantized to 6 decimals.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfTbl), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("raw"))
      .withColumn("score", floor(col("raw") * 1e6 + 0.5) / 1e6)
    val top = scored
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc))
        .cast("long"))
      .select(col("rank"), col("doc_id"), col("score"))
  }

  /** Batch BM25: MANY queries per corpus pass — the fan-out shape of
    * the reference's related-articles loop (get_relevant_articles.py:
    * 64-88 runs one retrieval per article; running them one
    * [[bm25TopK]] at a time would rescan the corpus per query).
    * `queries` is a (queryIdCol, termsCol: array<string>) frame;
    * output is (query_id, rank, doc_id, score) — top `k` per query.
    *
    * Scale shape, relative to the single-query form:
    *  - the postings prune can no longer be an `isin` literal; instead
    *    the DISTINCT term set of the whole batch (bounded: queries are
    *    a driver-bounded batch, like the ANN query frames) broadcasts
    *    into a semi join that drops non-query postings BEFORE the
    *    tf shuffle — one corpus scan for the entire batch;
    *  - tf/df are computed ONCE over the batch's term union and fan
    *    out to queries by a broadcast join on term (a doc-term posting
    *    reaches every query containing that term — |q|·|postings|
    *    rows only for matched terms, never a cartesian);
    *  - the per-query top-k is a window over candidates, partitioned
    *    by query id — candidate-sized, not corpus-sized.
    * Scores quantized exactly as [[bm25TopK]] (same contract with the
    * cross-engine oracle, q106).
    */
  def bm25TopKBatch(docs: DataFrame, idCol: String, textCol: String,
                    queries: DataFrame, queryIdCol: String, termsCol: String,
                    k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("term"))
      .distinct()
    val batchTerms = qt.select(col("term")).distinct()
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(batchTerms), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfTbl), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("raw"))
      .withColumn("score", floor(col("raw") * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Token-Jaccard ranked retrieval — a second, independent lexical
    * scorer over the same (query_id, terms) batch shape as
    * [[bm25TopKBatch]]: score = |terms ∩ doc tokens| / |terms ∪ doc
    * tokens| (set semantics, distinct tokens). Docs sharing no term
    * never materialize (the intersection join drops them). Same scale
    * shape as batch BM25: broadcast term prune before the shuffle,
    * per-query candidate-sized top-k window. Scores quantized to 6
    * decimals. Output: (query_id, rank, doc_id, score).
    */
  def tokenJaccardTopK(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, queryIdCol: String,
                       termsCol: String, k: Int): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("term")).distinct()
    val qSize = qt.groupBy(col("query_id"))
      .agg(count(lit(1)).as("q_n"))
    val toks = docs.select(col(idCol).as("doc_id"),
      array_distinct(tokens(col(textCol))).as("toks"))
    val dSize = toks.select(col("doc_id"), size(col("toks")).as("d_n"))
    val inter = toks
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(broadcast(qSize), Seq("query_id"))
      .join(dSize, Seq("doc_id"))
      .withColumn("score", floor(col("inter")
        / (col("q_n") + col("d_n") - col("inter")) * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Build a persistable BM25 postings index in ONE corpus pass: the
    * (term, doc_id, dl, tf) postings relation plus a one-row stats
    * relation (n_docs, avgdl) — the lexical twin of the ANN index
    * build ([[graft.operators.Similarity.ivfPqEncode]]) and the dedup
    * signature index: a real engine tokenizes the corpus ONCE and
    * amortizes the index across every query batch. Write both frames
    * as parquet ([[Layout.byKey]] on `term` gives row-group skipping
    * per term — the on-disk analogue of seeking a posting list);
    * incremental maintenance is an append of the delta's postings plus
    * an additive stats refresh, the q80/q103 shape.
    */
  def buildBm25Index(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val toks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), col("toks"))
    val stats = toks.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val postings = toks
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    (postings, stats)
  }

  /** Incremental index maintenance: fold a delta corpus into a
    * standing BM25 index WITHOUT touching indexed postings — the
    * delta's postings union in (contract: delta doc ids are disjoint
    * from indexed ones, the [[graft.operators.Similarity.ivfPqAppend]]
    * contract), and the stats row recombines additively:
    * n' = n + n_d, avgdl' = (n·avgdl + n_d·avgdl_d)/(n + n_d). Work
    * per refresh is O(delta), the q80/q103 incremental shape.
    * Spec-pinned: serving from the appended index ranks identically
    * to a full rebuild over the union.
    */
  def appendToBm25Index(postings: DataFrame, stats: DataFrame,
                        delta: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val (dPost, dStats) = buildBm25Index(delta, idCol, textCol)
    val merged = stats.select(col("n_docs").as("n_a"), col("avgdl").as("g_a"))
      .crossJoin(dStats.select(col("n_docs").as("n_b"),
        col("avgdl").as("g_b")))
      .select((col("n_a") + col("n_b")).as("n_docs"),
        // an empty arm's avg(dl) is NULL, and (n·g + 0·NULL)/(n+0)
        // would NULL-poison avgdl for every later score (the delete
        // arm guards its symmetric case); an empty delta — the
        // update-with-nothing shape — must keep the standing stats
        // verbatim, and appending onto an empty index must adopt the
        // delta's
        (when(col("n_b") === 0, col("g_a"))
          .when(col("n_a") === 0, col("g_b"))
          .otherwise((col("n_a") * col("g_a") + col("n_b") * col("g_b"))
            / (col("n_a") + col("n_b")))).as("avgdl"))
    (postings.unionByName(dPost), merged)
  }

  /** Delete documents from a standing BM25 index WITHOUT a rebuild —
    * the lexical twin of the ANN index's refit-free delete
    * ([[graft.operators.Similarity.ivfPqDelete]]), completing the
    * lifecycle the reference's in-place article rewrites need
    * (summarize_utils.py:84-88 `$set`-updates summary/content per URL;
    * a changed doc must first leave the index). Postings drop by a
    * broadcast anti join on doc id; the stats row decrements
    * ADDITIVELY: n' = n − n_d, avgdl' = (n·avgdl − Σdl_d)/(n − n_d),
    * with the deleted mass read from the index's own postings (one
    * surviving dl per deleted doc). Work per delete is O(index scan) —
    * never a re-tokenization of the corpus.
    *
    * Contract: ids not in the index are no-ops; a doc whose text
    * tokenized to ZERO tokens has no postings rows and therefore
    * cannot be seen by the decrement — such docs never enter the
    * index's stats mass either ([[tokens]] drops empties, so dl=0),
    * but n_docs counts them at build time, so delete ids must refer
    * to docs with ≥1 token (every real document).
    */
  def deleteFromBm25Index(postings: DataFrame, stats: DataFrame,
                          ids: DataFrame, idCol: String)
      : (DataFrame, DataFrame) = {
    val del = ids.select(col(idCol).cast("long").as("doc_id")).distinct()
    val kept = postings.join(broadcast(del), Seq("doc_id"), "left_anti")
    val dMass = postings.join(broadcast(del), Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_d"),
        coalesce(sum(col("dl")), lit(0L)).as("mass_d"))
    val merged = stats.select(col("n_docs").as("n_a"), col("avgdl").as("g_a"))
      .crossJoin(dMass)
      .select((col("n_a") - col("n_d")).as("n_docs"),
        when(col("n_a") === col("n_d"), lit(0.0))
          .otherwise((col("n_a") * col("g_a") - col("mass_d"))
            / (col("n_a") - col("n_d"))).as("avgdl"))
    (kept, merged)
  }

  /** In-place document update = delete + append — the reference's
    * `$set` upsert shape (mongo_io_manager.py:79-104: re-write
    * summary/content per URL). `updated` carries the NEW text for each
    * id; its ids leave the index first (so re-appearing ids never
    * double-count), then the fresh postings fold in via
    * [[appendToBm25Index]]. O(index scan + delta), never a corpus
    * re-tokenization. Spec-pinned: serve-after-update ≡ rebuild over
    * the updated corpus.
    */
  def updateBm25Index(postings: DataFrame, stats: DataFrame,
                      updated: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val (kept, dStats) =
      deleteFromBm25Index(postings, stats, updated.select(idCol), idCol)
    appendToBm25Index(kept, dStats, updated, idCol, textCol)
  }

  /** Batch BM25 served FROM a prebuilt index — no corpus scan, no
    * re-tokenization: the batch's DISTINCT term set is collected on
    * the driver (bounded by the same contract that lets [[bm25TopK]]
    * use an `isin` literal: query batches are driver-sized) and pushed
    * into the postings read as an `In(term, …)` LITERAL predicate.
    * Unlike a broadcast semi join — which filters rows AFTER the scan,
    * at execution — a pushed In predicate reaches the parquet reader's
    * row-group min/max skipping, so under a [[Layout.byKey]] term
    * layout the serve path genuinely seeks the |q| posting lists
    * instead of reading the whole postings relation per batch
    * (PlanSpec pins PushedFilters on q116's index scan). df aggregates
    * the surviving postings, and scoring/ranking are identical to
    * [[bm25TopKBatch]] (q116 pins index-served ≡ from-scratch via the
    * shared oracle arithmetic). The two deliberately do NOT share a
    * body: the one-shot form prunes postings BEFORE its tf aggregate
    * (only query-term postings are ever aggregated), while an index
    * build aggregates the full vocabulary once precisely so later
    * batches skip that work — collapsing them would force one-shot
    * queries to pay the full-vocabulary aggregate.
    */
  def bm25FromIndex(postings: DataFrame, stats: DataFrame,
                    queries: DataFrame, queryIdCol: String,
                    termsCol: String, k: Int, k1: Double = 1.2,
                    b: Double = 0.75,
                    maxBatchTerms: Int = 65536): DataFrame = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
        explode(col(termsCol)).as("term"))
      .filter(col("term").isNotNull) // a null term can never match a
      .distinct()                    // posting; dropping it here also
                                     // keeps the collect NPE-free
    // sanctioned bounded collect (the isin contract); sorted for a
    // deterministic predicate ordering across runs. The bound is
    // ENFORCED, not assumed ([[graft.operators.TextAnalysis
    // .viLexiconFrom]]'s capped-collect contract): a batch past the
    // cap fails loudly here instead of degrading the driver with an
    // unbounded collect and a codegen-hostile mega-In predicate —
    // limit(cap+1) keeps even the failing path's collect bounded
    val batchTerms = qt.select(col("term")).distinct()
      .limit(maxBatchTerms + 1)
      .collect().map(_.getString(0)).sorted.toSeq
    require(batchTerms.length <= maxBatchTerms,
      s"bm25FromIndex: query batch exceeds the $maxBatchTerms distinct-" +
        "term cap that bounds the driver-side In(term) pushdown; " +
        "split the batch or raise maxBatchTerms explicitly")
    val tf = postings.filter(col("term").isin(batchTerms: _*))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfTbl), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("raw"))
      .withColumn("score", floor(col("raw") * 1e6 + 0.5) / 1e6)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    * Buettcher, "Reciprocal Rank Fusion outperforms Condorcet and
    * individual rank learning methods", SIGIR 2009): each arm
    * contributes 1/(rrfK + rank) per (query, doc); missing arms
    * contribute nothing. Fusion is RANK-space, so arms with
    * incomparable score scales (BM25 vs Jaccard vs cosine) combine
    * without calibration — the hybrid-search shape of modern vector
    * stores. Arms must expose (query_id, doc_id, rank). The fused
    * score is quantized to 9 decimals BEFORE ranking (the two-arm sum
    * is exactly commutative; quantization guards the general case).
    * Output: (query_id, rank, doc_id, score).
    */
  def rrfFuse(arms: Seq[DataFrame], rrfK: Int = 60, k: Int = 10): DataFrame = {
    require(arms.nonEmpty, "rrfFuse: no arms")
    val parts = arms.map(_.select(col("query_id"), col("doc_id"),
        (lit(1.0) / (lit(rrfK.toDouble) + col("rank").cast("double")))
          .as("part")))
      .reduce(_.unionByName(_))
    val scored = parts.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part")).as("raw"))
      .withColumn("score", floor(col("raw") * 1e9 + 0.5) / 1e9)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedily pick k results maximizing
    * `λ·rel(c) − penaltyWeight·max_{s∈selected} cos(c, s)` — the
    * diversification pass RAG stacks run AFTER a cheap recall stage
    * (ANN/BM25 top-N) so near-duplicate hits don't crowd the context
    * window. Greedy selection is inherently sequential IN k but
    * embarrassingly parallel ACROSS queries, so the distributed shape
    * is: ONE shuffle grouping candidates by query, then each group
    * (N ≤ the recall stage's top-N, i.e. tens) reranks partition-
    * locally in O(N·k·dim). The candidate table never joins itself —
    * pairwise similarities are computed inside the group on exactly
    * the pairs the greedy walk touches.
    *
    * `penaltyWeight` defaults to `1-λ` but is explicit so an oracle
    * can pass the exact literal it also writes in SQL (1.0-0.7 is one
    * ulp off 0.3 in binary64). `roundDigits ≥ 0` floors rel and every
    * pairwise cosine at that many decimals before scoring (oracle
    * mode: comparisons then run on bit-identical doubles in any
    * engine); production passes -1 and keeps full precision.
    *
    * Input: (`qCol`: long, `idCol`: long, `relCol`: double,
    * `vecCol`: array<numeric>). Output: (qCol, mmr_rank, idCol,
    * mmr_score) with mmr_rank 1..k and mmr_score floored at
    * `roundDigits` when ≥ 0. Rank 1 is argmax rel (empty selected set
    * ⇒ zero penalty); ties break on ascending id everywhere.
    */
  def mmrRerank(candidates: DataFrame, qCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambda: Double = 0.7, penaltyWeight: Double = Double.NaN,
                roundDigits: Int = -1): DataFrame = {
    require(k >= 1, "mmrRerank: k must be >= 1")
    val pw = if (penaltyWeight.isNaN) 1.0 - lambda else penaltyWeight
    val spark = candidates.sparkSession
    import spark.implicits._
    val quant: Double => Double =
      if (roundDigits >= 0) {
        val p = math.pow(10, roundDigits)
        x => math.floor(x * p + 0.5) / p
      } else identity
    candidates
      .select(col(qCol).cast("long"), col(idCol).cast("long"),
        col(relCol).cast("double"), col(vecCol).cast("array<double>"))
      .as[(Long, Long, Double, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        val cs = it.map { case (_, id, rel, vec) =>
          (id, quant(rel), vec.toArray)
        }.toArray.sortBy(_._1)
        val norm = cs.map { c =>
          var s = 0.0; var i = 0
          while (i < c._3.length) { s += c._3(i) * c._3(i); i += 1 }
          math.sqrt(s)
        }
        def cos(a: Int, b: Int): Double = {
          // zero-norm guard: cosine against a degenerate vector is 0
          // (no directional similarity), not NaN — an unguarded NaN
          // here poisons every score at rank ≥ 2 and `score >
          // bestScore` never fires again
          if (norm(a) == 0.0 || norm(b) == 0.0) return 0.0
          val (va, vb) = (cs(a)._3, cs(b)._3)
          var d = 0.0; var i = 0
          while (i < va.length) { d += va(i) * vb(i); i += 1 }
          quant(d / (norm(a) * norm(b)))
        }
        val picked = Array.newBuilder[(Long, Long, Long, Double)]
        val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
        val taken = new Array[Boolean](cs.length)
        var rank = 1L
        while (rank <= k && selected.length < cs.length) {
          var best = -1; var bestScore = Double.NegativeInfinity
          var c = 0
          while (c < cs.length) {
            if (!taken(c)) {
              // max over the selected set, NOT clamped at zero — an
              // all-negative neighborhood must reward, not no-op
              var pen = 0.0
              var first = true
              selected.foreach { s =>
                val v = cos(c, s)
                pen = if (first) v else math.max(pen, v)
                first = false
              }
              val score = lambda * cs(c)._2 - pw * pen
              // strict > plus ascending scan order = ties to lowest id
              if (score > bestScore) { best = c; bestScore = score }
            }
            c += 1
          }
          // degrade, don't crash: a NaN rel (or any score set where
          // nothing beats -∞) leaves best = -1 — emit what was picked
          if (best < 0) { rank = k + 1 }
          else {
            taken(best) = true
            selected += best
            picked += ((q, rank, cs(best)._1, quant(bestScore)))
            rank += 1
          }
        }
        picked.result().iterator
      }
      .toDF(qCol, "mmr_rank", idCol, "mmr_score")
  }
}
