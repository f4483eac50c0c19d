package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Similarity search over embedding columns (`ArrayType(FloatType)`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH bucketed variant as the scale path (the reference's
  * HNSW ANN — get_relevant_articles.py:64-88 — re-expressed for a
  * shared-nothing engine; SURVEY.md §4 "ANN index" row).
  *
  * Scale shape: brute force is queries×corpus — fine for ≤10⁵ corpus
  * rows per query batch, and embarrassingly parallel (broadcast the
  * query batch, scan the corpus once). The LSH variant buckets the
  * corpus scan-side so each query only meets its bucket: the shuffle
  * is keyed on bucket id, fan-in ≈ corpus/2^bits.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query row.
    * `queries`/`corpus` need (idCol, vecCol). Output:
    * (q_id, rank, c_id, sim). Tie-broken by candidate id so results are
    * total-ordered and reproducible.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", Vectors.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("sim"))
  }

  /** Deterministic random hyperplanes: `bits` planes of dimension `dim`,
    * seeded — the driver-side constants are tiny and broadcast as
    * literals into the plan.
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH bucket id: sign bits of the vector against each hyperplane. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(Vectors.toDouble(vec), planeLit,
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(d >= 0.0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: queries only meet corpus rows in the same LSH
    * bucket (single shuffle on bucket id). Recall traded for a
    * 2^bits-fold reduction in compared pairs; multiprobe = also probe
    * buckets at hamming distance 1 when `multiprobe` is set.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              dim: Int, bits: Int = 8, multiprobe: Boolean = true,
              seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim, bits, seed)
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      lshBucket(col(vecCol), planes).as("b0"))
    val probes =
      if (!multiprobe) array(col("b0"))
      else array(col("b0") +: (0 until bits).map(j =>
        col("b0").bitwiseXOR(shiftleft(lit(1L), j))): _*)
    val q = qBase.select(col("q_id"), col("q_vec"),
      explode(probes).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", Vectors.cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("sim"))
  }

  /** Deterministic feature-hash embedding stand-in for the reference's
    * sentence-transformer (M3, embedding_utils.py:26-92): tokens hashed
    * into `dim` signed buckets, L2-normalized. Pure HOF expressions —
    * computed scan-side, codegen'd, reproducible across engines/runs.
    */
  def hashEmbedding(text: Column, dim: Int = 64): Column = {
    val tokens = filter(split(lower(text), "\\s+"), t => length(t) > 0)
    val raw = aggregate(tokens,
      array_repeat(lit(0.0), dim),
      (acc, t) => {
        val idx  = pmod(xxhash64(t), lit(dim)).cast("int")
        val sign = when(pmod(xxhash64(t, lit(1)), lit(2)) === 0, 1.0)
          .otherwise(-1.0)
        zip_with(acc, sequence(lit(0), lit(dim - 1)),
          (a, j) => a + when(j === idx, sign).otherwise(0.0))
      })
    Vectors.l2Normalize(raw)
  }

  /** Element-wise mean of grouped vectors (A2 mean-pool,
    * embedded_articles.py:167), as a relational posexplode→avg→reassemble:
    * shuffles (key, component) pairs — scales linearly, no driver state,
    * map-side partial aggregation applies.
    */
  def vecMean(df: DataFrame, keyCol: String, vecCol: String): DataFrame = {
    val exploded = df.select(col(keyCol).as("key"),
      posexplode(col(vecCol)).as(Seq("pos", "v")))
    exploded.groupBy("key", "pos").agg(avg("v").as("m"))
      .groupBy("key")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("mean_vec"))
  }
}
