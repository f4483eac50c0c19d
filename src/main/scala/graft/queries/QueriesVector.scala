package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{ColumnPlugins, Text, Vectors}
import graft.operators._

/** The engine's demonstrable query suite: one entry per operator family
  * from SURVEY.md §2 (+ the large-scale curation extensions), each with
  * a DuckDB-runnable oracle where SQL can express the semantics.
  *
  * Column names and types are aligned pairwise between the Spark plan
  * and the oracle SQL — the driver's compare hashes values under sorted
  * column names. Nondeterministic orderings are always tie-broken by a
  * unique key; floating aggregates are rounded identically on both
  * sides (engine-difference ≈1e-15 ≪ rounding granularity).
  */

/** Vector similarity and ANN: brute force, IVF/PQ/SQ8, HNSW, staleness.
  *
  * Definitions only — the registry, oracle map and shared loader
  * live in [[Queries]]; the self-type gives every family access to
  * the shared helpers and cross-family fixtures without changing
  * any call site (mechanical split of the flat registry file; no
  * behavior change).
  */
private[queries] trait QueriesVector { this: Queries.type =>

  // ---------------------------------------------------------------- q23
  // A2: element-wise vector mean per group
  private[queries] def q23(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // typed Aggregator: ONE shuffle of (sums[64], count) partials per
    // label — not 64× exploded rows (scale note in VecMeanAgg docs)
    Similarity.vecMeanAgg(t(s, dir, "embeddings"), "label", "embedding")
      .select($"key".as("label"), posexplode($"mean_vec").as(Seq("pos", "v")))
      .select($"label", $"pos".cast("long").as("idx"),
        round($"v", 5).as("mean_val"))
      .orderBy($"label", $"idx")
  }
  private[queries] lazy val q23Sql =
    """SELECT label, i - 1 AS idx, round(avg(embedding[i]), 5) AS mean_val
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY 1, 2 ORDER BY label, idx""".stripMargin

  // ---------------------------------------------------------------- q24
  // J5: brute-force cosine top-k similarity join
  private[queries] def q24(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  /** DuckDB brute-force cosine top-k over `embeddings` for queries
    * matching `pred` — the shared oracle for every exact-equivalent
    * retrieval path (q24 brute force, q48 exhaustive IVF, q77
    * exhaustive IVF-PQ): same tie-break (sim DESC, c_id) as
    * Similarity.rankTopK.
    */
  private[queries] def bruteTopKSql(pred: String, k: Int): String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
       |  FROM embeddings WHERE $pred),
       |c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(qv, cv)
       |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
       |    AS sim
       | FROM q, c WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
       | FROM sc)
       |SELECT q_id, rank, c_id, round(sim, 6) AS sim
       |FROM r WHERE rank <= $k ORDER BY q_id, rank""".stripMargin
  private[queries] lazy val q24Sql = bruteTopKSql("vec_id < 10", 5)

  // ---------------------------------------------------------------- q28
  // M3 stand-in: hash-embedding + per-language mean pool, oracle mode
  // (Dedup.Md5): DuckDB replays the md5-derived bucket/sign hashing,
  // the per-doc L2 normalization, and the key×dim densified mean.
  // Scalar (lang, idx, mean_val) rows — an array-typed result column
  // would break the driver's pandas sort-by-value hashing. Production
  // path keeps xxhash64 (equivalence spec'd in VectorSimilaritySpec).
  private[queries] def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.hashEmbedMeanByKey(t(s, dir, "documents"),
        "lang", "doc_id", "text", 16, hash = Dedup.Md5)
      .select($"key".as("lang"), $"idx".cast("long").as("idx"),
        (floor($"mean_val" * 100000.0 + 0.5) / 100000.0).as("mean_val"))
      .orderBy($"lang", $"idx")
  }
  private[queries] lazy val q28Sql =
    """WITH tok AS (
      | SELECT doc_id AS id, lang AS key,
      |  unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |    x -> len(x) > 0)) AS tk
      | FROM documents),
      |h AS (SELECT id, key,
      |  ('0x' || substr(md5(tk), 1, 8))::BIGINT AS h FROM tok),
      |sp AS (SELECT id, key, h % 16 AS idx,
      |  CASE WHEN (h >> 16) % 2 = 0 THEN 1.0::DOUBLE
      |   ELSE -1.0::DOUBLE END AS s
      | FROM h),
      |sparse AS (SELECT id, key, idx, sum(s) AS v
      | FROM sp GROUP BY id, key, idx),
      |norms AS (SELECT id, sqrt(sum(v * v)) AS norm FROM sparse
      | GROUP BY id HAVING sqrt(sum(v * v)) > 0),
      |unit AS (SELECT sparse.id, sparse.key, sparse.idx, sparse.v, norm
      | FROM sparse JOIN norms USING (id)),
      |nd AS (SELECT key, count(DISTINCT id) AS n_docs
      | FROM unit GROUP BY key),
      |sums AS (SELECT key, idx, sum(v / norm) AS sv
      | FROM unit GROUP BY key, idx),
      |grid AS (SELECT key, n_docs, unnest(range(0, 16)) AS idx FROM nd)
      |SELECT key AS lang, CAST(idx AS BIGINT) AS idx,
      | floor((COALESCE(sv, 0.0::DOUBLE) / n_docs) * 100000.0 + 0.5)
      |   / 100000.0 AS mean_val
      |FROM grid LEFT JOIN sums USING (key, idx)
      |ORDER BY lang, idx""".stripMargin

  // ---------------------------------------------------------------- q29
  // LSH-bucketed approximate ANN, now oracle-checked: the seeded
  // hyperplane constants ride into BOTH plans as literals (Spark via
  // lshBucket's array literals, DuckDB via generated left-assoc dot
  // chains that reproduce the sequential-fold summation order
  // bit-for-bit), so bucket sign bits, multiprobe neighbors, and the
  // ranked cosines all match exactly. Recall stays spec'd in tests.
  private[queries] def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", 5, dim = 64, bits = 8)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q29Sql = {
    val planes = Similarity.hyperplanes(64, 8, 42L)
    // explicit a[1]·p1 + a[2]·p2 + … chain: SQL + is left-associative,
    // matching the native DotProduct's sequential double fold exactly —
    // sign bits near zero cannot flip between engines
    def dotChain(vec: String, p: Array[Double]): String =
      p.zipWithIndex.map { case (c, i) =>
        s"$vec[${i + 1}]::DOUBLE * (${java.lang.Double.toString(c)})"
      }.mkString(" + ")
    def bucket(vec: String): String =
      "(" + planes.zipWithIndex.map { case (p, j) =>
        s"(CASE WHEN ${dotChain(vec, p)} >= 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" | ") + ")"
    val toD = (v: String) => s"list_transform($v, x -> CAST(x AS DOUBLE))"
    s"""WITH c AS (
       | SELECT vec_id AS c_id, embedding AS c_vec,
       |  ${bucket("embedding")} AS bucket
       | FROM embeddings),
       |qb AS (
       | SELECT vec_id AS q_id, embedding AS q_vec,
       |  ${bucket("embedding")} AS b0
       | FROM embeddings WHERE vec_id < 10),
       |q AS (
       | SELECT q_id, q_vec,
       |  unnest([b0] || [xor(b0, 1 << j) for j in range(0, 8)]) AS bucket
       | FROM qb),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(${toD("q_vec")}, ${toD("c_vec")})
       |   / (sqrt(list_dot_product(${toD("q_vec")}, ${toD("q_vec")}))
       |    * sqrt(list_dot_product(${toD("c_vec")}, ${toD("c_vec")})))
       |   AS sim
       | FROM q JOIN c USING (bucket) WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
       |   AS rank
       | FROM sc)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
       | round(sim, 6) AS sim
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q38
  // J5+J6+U3: filtered top-k with same-topic priority and fallback fill
  private[queries] def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.topKWithFallback(emb.filter($"vec_id" < 10), emb,
        "vec_id", "embedding", "label", 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        $"same_topic".cast("long").as("same_topic"),
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q38Sql =
    """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
      |  embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
      |c AS (SELECT vec_id AS c_id, label AS c_label,
      |  embedding::DOUBLE[] AS cv FROM embeddings),
      |sc AS (
      | SELECT q_id, c_id,
      |  CASE WHEN q_label = c_label THEN 1 ELSE 0 END AS same_topic,
      |  list_dot_product(qv, cv)
      |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |    AS sim
      | FROM q, c WHERE q_id <> c_id),
      |r AS (SELECT q_id, c_id, same_topic, sim,
      | row_number() OVER (PARTITION BY q_id
      |   ORDER BY same_topic DESC, sim DESC, c_id) AS rank
      | FROM sc)
      |SELECT q_id, rank, c_id, CAST(same_topic AS BIGINT) AS same_topic,
      | round(sim, 6) AS sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q47
  // Embedding-cosine near-dup pairs, exact mode (bits=0) on a bounded
  // subset so DuckDB can verify; the LSH-bucketed mode is the scale
  // path (recall-tested in VectorSimilaritySpec)
  private[queries] def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "embeddings").filter($"vec_id" < 200)
      .select($"vec_id", $"embedding")
    // inject exact copies (id+1000) so near-dup pairs exist at any sf
    val emb = base.unionByName(base.filter($"vec_id" < 50)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
    Similarity.nearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.8, dim = 64, bits = 0)
      .select($"id_a", $"id_b", round($"sim", 6).as("sim"))
      .orderBy($"id_a", $"id_b")
  }
  private[queries] lazy val q47Sql =
    """WITH e AS (
      | SELECT vec_id, embedding::DOUBLE[] AS v
      |  FROM embeddings WHERE vec_id < 200
      | UNION ALL
      | SELECT vec_id + 10000000, embedding::DOUBLE[]
      |  FROM embeddings WHERE vec_id < 50),
      |p AS (
      | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_dot_product(a.v, b.v)
      |   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      |   AS sim
      | FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, round(sim, 6) AS sim
      |FROM p WHERE sim > 0.8 ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q48
  // IVF ANN, oracle mode: exhaustive probing (nprobe = nlist) makes the
  // search provably ≡ brute force — every corpus vector sits in exactly
  // ONE cell, probing all cells reconstructs the full candidate set
  // exactly once, and the exact re-rank + (sim DESC, c_id) tie-break
  // match bruteTopKSql bit-for-bit. That puts the k-means path's
  // machinery (assignment completeness, candidate-join exactness,
  // ranking) under the cross-engine oracle; the production recall mode
  // (nprobe < nlist) is spec-pinned in VectorSimilaritySpec. The
  // quantizer is fit ONCE per (dir, nlist) and cached — the
  // index-build/search split every real ANN engine has; the query
  // measures search.
  private[queries] lazy val ivfModels =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Similarity.IvfModel]
  private[queries] def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = ivfModels.getOrElseUpdate((dir, 16),
      Similarity.fitIvf(emb, "embedding", nlist = 16))
    Similarity.ivfTopK(model,
        emb.filter($"vec_id" >= 10 && $"vec_id" < 20), emb,
        "vec_id", "embedding", k = 5, nprobe = 16)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q48Sql = bruteTopKSql("vec_id >= 10 AND vec_id < 20", 5)

  // ---------------------------------------------------------------- q76
  // Product-quantization ANN on the FLAT pqTopK baseline (so the
  // q76/q77 pair measures what IVF pruning + residual encoding buy;
  // production call sites use ivfPqTopK — see the "superseded at
  // scale" note on Similarity.pqTopK). Codebooks fit once per dir and
  // cached like q48's IVF quantizer.
  //
  // ORACLE: the ADC ranking is fully deterministic GIVEN the fitted
  // codebooks — encode is an argmin of sequential-fold squared-L2
  // chains, reconstruction is codeword lookup, and the cosine against
  // the raw query is the same fold q24 already oracles. So the oracle
  // SQL is GENERATED from the very model the query ran (q29's
  // hyperplane-literal trick, extended to fitted parameters):
  // per-subspace distance chains in left-associative `+` (bit-equal to
  // VectorKernels.nearestCells' loop), argmin via
  // list_position(d, list_min(d)) (first strict minimum — the kernel's
  // tie-break), codeword tables as list literals. Verify dumps
  // oracleSql AFTER running the queries, so the fitted model is always
  // in cache when the SQL is built (ContractSpec pins this wiring).
  private[queries] lazy val pqModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.PqModel]
  @volatile private var lastPqDir: Option[String] = None
  private[queries] def q76(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = pqModels.getOrElseUpdate(dir,
      Similarity.fitPq(emb, "embedding", m = 8, k = 16))
    lastPqDir = Some(dir)
    val codes = Similarity.pqEncode(model, emb, "vec_id", "embedding")
    Similarity.pqTopK(model, emb.filter($"vec_id" < 10), codes,
        "vec_id", "embedding", k = 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }

  /** q76's oracle, built from the codebooks fitted by the LAST q76 run
    * (None until q76 has run in this JVM — Verify's dump order
    * guarantees it has).
    */
  private[queries] def q76SqlNow: Option[String] =
    lastPqDir.flatMap(pqModels.get).map(q76SqlFor)

  private[queries] def q76SqlFor(model: Similarity.PqModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    val m = model.m
    val sub = model.subDim
    // per-subspace: 16 squared-L2 chains (left-assoc + : the kernel's
    // fold order), then the first-minimum codeword's literal vector
    val distCols = (0 until m).map { mi =>
      val chains = model.codebooks(mi).map { cw =>
        (0 until sub).map { i =>
          val idx = mi * sub + i + 1 // 1-based SQL list index
          s"(v[$idx]-(${dd(cw(i))}))*(v[$idx]-(${dd(cw(i))}))"
        }.mkString("+")
      }
      s"[${chains.mkString(",\n   ")}] AS d$mi"
    }.mkString(",\n  ")
    val wordCols = (0 until m).map { mi =>
      val book = model.codebooks(mi)
        .map(cw => s"[${cw.map(dd).mkString(",")}]").mkString(",")
      s"([$book])[list_position(d$mi, list_min(d$mi))] AS w$mi"
    }.mkString(",\n  ")
    val cv = (0 until m).map(mi => s"w$mi").mkString(" || ")
    s"""WITH c AS (
       | SELECT vec_id AS c_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings),
       |d AS (SELECT c_id, v,
       |  $distCols
       | FROM c),
       |e AS (SELECT c_id,
       |  $wordCols
       | FROM d),
       |rc AS (SELECT c_id, $cv AS cv FROM e),
       |q AS (SELECT vec_id AS q_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       | FROM embeddings WHERE vec_id < 10),
       |sc AS (
       | SELECT q_id, c_id,
       |  list_dot_product(qv, cv)
       |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
       |   AS sim
       | FROM q, rc WHERE q_id <> c_id),
       |r AS (SELECT q_id, c_id, sim,
       | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
       |   AS rank
       | FROM sc)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
       | round(sim, 6) AS sim
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q77
  // IVF-PQ composed ANN, oracle mode: exhaustive probing (nprobe =
  // nlist) + no PQ survivor cut (rerankFactor = 0) make the two-stage
  // search provably ≡ brute force — the index join must yield every
  // corpus vector exactly once and the exact re-rank + tie-break then
  // match bruteTopKSql bit-for-bit, putting the encode/join/re-rank
  // plumbing under the cross-engine oracle. The production shape
  // (nprobe < nlist, PQ-scored survivor cut; recall ≥ plain PQ) is
  // spec-pinned in VectorSimilaritySpec. Models cached per dir like
  // q48/q76.
  private[queries] lazy val ivfPqModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfPqModel]
  private[queries] def q77(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val model = ivfPqModels.getOrElseUpdate(dir,
      Similarity.fitIvfPq(emb, "embedding", nlist = 16, m = 8, k = 16))
    val index = Similarity.ivfPqEncode(model, emb, "vec_id", "embedding")
    Similarity.ivfPqTopK(model,
        emb.filter($"vec_id" >= 20 && $"vec_id" < 30), index, emb,
        "vec_id", "embedding", k = 5, nprobe = 16, rerankFactor = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q77Sql = bruteTopKSql("vec_id >= 20 AND vec_id < 30", 5)

  // ---------------------------------------------------------------- q113
  // SQ8 scalar-quantized ANN (Similarity.sq8Encode/sq8TopK): the 4×
  // compression point between flat float32 and PQ's ~32×. No trained
  // codebook — encode is a pure per-row expression, so the WHOLE
  // encode→reconstruct→rank path is deterministic and the oracle
  // replays it value-for-value (no exhaustive-mode or fitted-literal
  // tricks needed): per-vector (lo, scale), code = floor((x−lo)/scale
  // + 0.5), reconstruct lo + code·scale, cosine vs the raw queries.
  private[queries] def q113(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val codes = Similarity.sq8Encode(emb, "vec_id", "embedding")
    Similarity.sq8TopK(emb.filter($"vec_id" < 10), codes,
        "vec_id", "embedding", k = 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q113Sql =
    """WITH c AS (SELECT vec_id AS c_id,
      |  embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT c_id, v, list_min(v) AS lo,
      |  (list_max(v) - list_min(v)) / 255.0 AS sc
      | FROM c),
      |r AS (SELECT c_id,
      |  CASE WHEN sc > 0
      |   THEN list_transform(v, x -> lo + floor((x - lo) / sc + 0.5) * sc)
      |   ELSE list_transform(v, x -> lo) END AS cv
      | FROM s),
      |q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
      | FROM embeddings WHERE vec_id < 10),
      |sc2 AS (
      | SELECT q_id, c_id,
      |  list_dot_product(qv, cv)
      |   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |   AS sim
      | FROM q, r WHERE q_id <> c_id),
      |rk AS (SELECT q_id, c_id, sim,
      | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)
      |   AS rank
      | FROM sc2)
      |SELECT q_id, CAST(rank AS BIGINT) AS rank, c_id,
      | round(sim, 6) AS sim
      |FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q164
  // Binary-quantization ANN (Similarity.bqEncode/bqTopK) — the sixth
  // ANN family, the far end of the compression ladder: sign-vs-mean
  // bits packed 63/long, hamming candidates, exact rerank. Run at the
  // exhaustive parameterization (rerankFactor = 0 reranks EVERY
  // candidate), which makes the output ≡ brute-force cosine top-k —
  // the q48/q77 oracle pattern; the approximate mode's recall is
  // spec-pinned in VectorSimilaritySpec.
  private[queries] def q164(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    Similarity.bqTopK(emb.filter($"vec_id" >= 30 && $"vec_id" < 40),
        emb, "vec_id", "embedding", k = 5, rerankFactor = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q164Sql =
    bruteTopKSql("vec_id >= 30 AND vec_id < 40", 5)

  // ---------------------------------------------------------------- q129
  // Tagged HNSW under the ORACLE contract (the q48/q77 pattern for
  // fitted ANN structures): the full tagged lifecycle — tag-sharded
  // graph build, broadcast tag routing, scatter-gather serve,
  // own-id exclusion — runs at the exhaustive parameterization
  // (ef <= 0 scores EVERY vector in the routed shard with the graph
  // kernel's own distance; provable, unlike a "big ef" beam whose
  // reach depends on graph connectivity), which makes the output ≡
  // per-tag brute-force cosine top-k. DuckDB replays that brute force
  // with an independent tag join. The approximate beam mode stays
  // recall-spec-pinned in HnswSpec; q50x benches it.
  private[queries] def q129(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
      .select($"vec_id", $"embedding",
        concat(lit("t"), pmod($"vec_id", lit(4))).as("tag"))
    val (idx, tagMap) = graft.operators.Hnsw.buildTagged(
      emb, "vec_id", "embedding", "tag")
    val queries = emb.filter($"vec_id" < 12)
    graft.operators.Hnsw.topKTagged(idx, tagMap, queries,
        "vec_id", "embedding", "tag", k = 5, ef = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q129Sql =
    """WITH e AS (
      | SELECT vec_id, embedding::DOUBLE[] AS v, vec_id % 4 AS tag
      | FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS qv, tag FROM e WHERE vec_id < 12),
      |c AS (SELECT vec_id AS c_id, v AS cv, tag FROM e),
      |sc AS (
      | SELECT q_id, c_id,
      |  list_dot_product(qv, cv)
      |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
      |    AS sim
      | FROM q JOIN c ON q.tag = c.tag AND q.q_id <> c.c_id),
      |r AS (SELECT q_id, c_id, sim,
      | row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
      | FROM sc)
      |SELECT q_id, rank, c_id, round(sim, 6) AS sim
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- q131
  // Hash-sharded HNSW under the oracle contract — q129's sibling for
  // the UNTAGGED path: every query scatters to every shard
  // (routed = false), each shard scores exhaustively at ef <= 0, and
  // the global top-k window merges — provably ≡ GLOBAL brute-force
  // cosine top-k, so q24's own oracle SQL shape applies verbatim.
  // Build, shard co-location, scatter-gather and the merge window are
  // all exercised; the approximate beam stays recall-pinned in
  // HnswSpec and benched by q49x.
  private[queries] def q131(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val idx = graft.operators.Hnsw.buildShards(emb, "vec_id",
      "embedding", shards = 4)
    graft.operators.Hnsw.topK(idx, emb.filter($"vec_id" >= 10 &&
        $"vec_id" < 22), "vec_id", "embedding", k = 4, ef = 0)
      .select($"q_id", $"rank".cast("long").as("rank"), $"c_id",
        round($"sim", 6).as("sim"))
      .orderBy($"q_id", $"rank")
  }
  private[queries] lazy val q131Sql = bruteTopKSql("vec_id >= 10 AND vec_id < 22", 4)

  // ---------------------------------------------------------------- q130
  // ANN centroid-staleness signal under the FITTED-oracle contract
  // (q76's pattern): fit an IVF-PQ quantizer on 3/4 of the embeddings,
  // then measure two append batches through centroidStaleness — the
  // held-out quarter (in-distribution: ratio ≈ 1, no refit flag) and
  // the same quarter shifted +2.0 per component (drifted: ratio far
  // past the 1.25 threshold, flag trips). The oracle is generated from
  // the fitted centroids AFTER the query runs: per-row nearest-
  // centroid distance as nlist literal squared-L2 chains (the
  // NearestCells kernel's fold order), the batch quantile via
  // quantile_disc (exact ≡ percentile_approx at accuracy ≥ n), and
  // the fit baseline as a literal from the model. Both engines replay
  // the DECISION — distance, quantile, ratio, flag — end to end.
  private[queries] lazy val staleModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfPqModel]
  @volatile private var lastStaleDir: Option[String] = None
  private[queries] def q130(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val base = emb.filter(pmod($"vec_id", lit(4)) =!= 0)
    val model = staleModels.getOrElseUpdate(dir,
      Similarity.fitIvfPq(base, "embedding", nlist = 8, m = 2, k = 16))
    lastStaleDir = Some(dir)
    // both batches in DOUBLE space so the +2.0 shift is the same
    // arithmetic the oracle's list_transform applies
    val held = emb.filter(pmod($"vec_id", lit(4)) === 0)
      .select($"vec_id",
        graft.functions.Vectors.toDouble($"embedding").as("embedding"))
    val drifted = held.select($"vec_id",
      transform($"embedding", x => x + lit(2.0)).as("embedding"))
    // accuracy 1e7 (q98's setting) keeps percentile_approx EXACT —
    // rank error < 1 — for any delta the driver's scale factors reach
    val rIn = Similarity.centroidStaleness(model.ivf, held, "embedding",
      accuracy = 10000000)
    val rDr = Similarity.centroidStaleness(model.ivf, drifted, "embedding",
      accuracy = 10000000)
    Seq(("drifted", rDr), ("in_dist", rIn))
      .map { case (b, r) => (b, r.fitQ, r.deltaQ, r.ratio,
        r.refitRecommended) }
      .toDF("batch", "fq", "dq", "rt", "refit_recommended")
      .select($"batch", round($"fq", 6).as("fit_q"),
        round($"dq", 6).as("delta_q"), round($"rt", 6).as("ratio"),
        $"refit_recommended")
      .orderBy($"batch")
  }
  private[queries] def q130SqlNow: Option[String] =
    lastStaleDir.flatMap(staleModels.get).map(q130SqlFor)
  private[queries] def q130SqlFor(model: Similarity.IvfPqModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    val (q, fitQ) = model.ivf.fitDistQ.getOrElse(
      throw new IllegalStateException("q130 model lacks fitDistQ"))
    val chains = model.ivf.centroids.map { c =>
      c.zipWithIndex.map { case (cv, i) =>
        s"(v[${i + 1}]-(${dd(cv)}))*(v[${i + 1}]-(${dd(cv)}))"
      }.mkString("+")
    }.mkString(",\n   ")
    s"""WITH e AS (
       | SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       | FROM embeddings WHERE vec_id % 4 = 0),
       |b AS (
       | SELECT 'in_dist' AS batch, v FROM e
       | UNION ALL
       | SELECT 'drifted', list_transform(v, x -> x + 2.0) FROM e),
       |d AS (SELECT batch,
       |  sqrt(list_min([$chains])) AS dist
       | FROM b),
       |qq AS (SELECT batch, quantile_disc(dist, ${dd(q)}) AS dq
       | FROM d GROUP BY batch)
       |SELECT batch, round(${dd(fitQ)}, 6) AS fit_q,
       | round(dq, 6) AS delta_q,
       | round(dq / (${dd(fitQ)}), 6) AS ratio,
       | dq / (${dd(fitQ)}) > 1.25 AS refit_recommended
       |FROM qq ORDER BY batch""".stripMargin
  }

  // ---------------------------------------------------------------- q191
  // Cluster-balanced sampling (Curation.clusterSample) — the
  // diversity-preserving subsample of the SemDeDup/SSL-prototypes
  // family: assign every embedding to its nearest fitted-IVF cell
  // (the SAME frozen coarse quantizer the ANN/semantic-dedup/drift
  // stack amortizes), rank within the cell by centroid distance, keep
  // the 5 most prototypical per cell. The BUCKETED algorithm itself
  // is under the oracle: fitted centroids become frozen literals in
  // generated SQL (the q76/q120 pattern) and DuckDB re-derives cells
  // with the same left-assoc squared-L2 chains + first-minimum
  // argmin, ranks on the bit-identical raw distance, and rounds the
  // reported distance identically.
  private[queries] lazy val clusterSampleModels =
    scala.collection.concurrent.TrieMap.empty[String, Similarity.IvfModel]
  @volatile private var lastClusterSampleDir: Option[String] = None
  private[queries] def q191(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings").filter($"vec_id" < 400)
      .select($"vec_id", $"embedding")
    val model = clusterSampleModels.getOrElseUpdate(dir,
      Similarity.fitIvf(emb, "embedding", nlist = 8))
    lastClusterSampleDir = Some(dir)
    Curation.clusterSample(emb, "vec_id", "embedding", model,
        perCluster = 5)
      .select($"vec_id", $"cell", $"cell_rank", $"cell_dist")
      .orderBy($"vec_id")
  }

  /** q191's oracle, generated from the centroids fitted by the LAST
    * q191 run (None until q191 has run in this JVM — Verify's
    * run-then-dump order guarantees it has, like q76/q120).
    */
  private[queries] def q191SqlNow: Option[String] =
    lastClusterSampleDir.flatMap(clusterSampleModels.get)
      .map(q191SqlFor)

  private[queries] def q191SqlFor(model: Similarity.IvfModel): String = {
    def dd(x: Double) = java.lang.Double.toString(x)
    // per-cell squared-L2 as a left-assoc `+` chain — bit-equal to
    // VectorKernels.nearestCells' ascending-index fold; argmin by
    // list_position(dc, list_min(dc)) = first strict minimum, the
    // kernel's tie-break; the kernel's cell ids are 0-based
    val chains = model.centroids.map { cent =>
      cent.zipWithIndex.map { case (x, i) =>
        s"(v[${i + 1}]-(${dd(x)}))*(v[${i + 1}]-(${dd(x)}))"
      }.mkString("+")
    }
    s"""WITH e AS (
       | SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       | WHERE vec_id < 400),
       |d AS (SELECT vec_id,
       |  [${chains.mkString(",\n   ")}] AS dc
       | FROM e),
       |c AS (SELECT vec_id,
       |  CAST(list_position(dc, list_min(dc)) - 1 AS INT) AS cell,
       |  sqrt(list_min(dc)) AS dist
       | FROM d),
       |r AS (SELECT vec_id, cell, dist, row_number() OVER (
       |  PARTITION BY cell ORDER BY dist, vec_id) AS rk
       | FROM c)
       |SELECT vec_id, cell, CAST(rk AS INT) AS cell_rank,
       | floor(dist * 1000000 + 0.5) / 1000000 AS cell_dist
       |FROM r WHERE rk <= 5 ORDER BY vec_id""".stripMargin
  }
}
