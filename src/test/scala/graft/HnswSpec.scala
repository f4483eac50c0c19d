package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.{Hnsw, Similarity}

/** True HNSW: graph properties, build/search determinism, sharded
  * scatter-gather equivalence, and measured recall in the reference's
  * own regime (hnsw_ef=128 on clustered embeddings).
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val K = 10

  private def topSet(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(truth: Map[Long, Set[Long]], df: DataFrame): Double = {
    val approx = topSet(df)
    val per = truth.map { case (q, t) =>
      (t intersect approx.getOrElse(q, Set.empty)).size.toDouble / t.size }
    per.sum / per.size
  }

  private lazy val clustered = {
    val rnd = new scala.util.Random(17)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    (0 until 2000).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat))
    }.toDF("vec_id", "embedding").cache()
  }
  private lazy val cluQ = clustered.filter($"vec_id" < 50)
  private lazy val cluTruth =
    topSet(Similarity.bruteForceTopK(cluQ, clustered,
      "vec_id", "embedding", K))

  test("level assignment is deterministic, exponentially decaying, " +
    "and bounded") {
    val p = Hnsw.Params(m = 16, seed = 42L)
    val levels = (0L until 20000L).map(Hnsw.levelOf(_, p))
    assert(levels == (0L until 20000L).map(Hnsw.levelOf(_, p)))
    assert(levels.forall(l => l >= 0 && l <= 32))
    val counts = levels.groupBy(identity).view.mapValues(_.size).toMap
    // P(level ≥ 1) = 1/m: ~1250 of 20000 at m=16 (±50%)
    val above = levels.count(_ >= 1)
    assert(above > 600 && above < 2500, s"level≥1 count $above")
    // decay: each level is rarer than the one below
    (1 to 2).foreach { l =>
      assert(counts.getOrElse(l, 0) < counts(l - 1), s"level $l")
    }
  }

  test("single-graph search finds exact duplicates and near " +
    "neighbors; self is excluded by the serve path") {
    val g = new Hnsw.Graph(Hnsw.Params(m = 8, efConstruction = 40))
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 500L).map(i =>
      i -> Array.fill(16)(rnd.nextGaussian())).toMap
    vecs.toSeq.sortBy(_._1).foreach { case (id, v) => g.insert(id, v) }
    // an exact duplicate of node 3's vector must rank it first
    val hits = g.search(vecs(3L), 5, ef = 64)
    assert(hits.head._1 == 3L && math.abs(hits.head._2 - 1.0) < 1e-12)
    assert(hits.map(_._1).distinct.size == hits.size)
    // searches are deterministic
    assert(hits == g.search(vecs(3L), 5, ef = 64))
  }

  test("buildShards is deterministic (two builds produce identical " +
    "index rows) and persists per-node per-level adjacency") {
    def build() = Hnsw.buildShards(clustered, "vec_id", "embedding",
        shards = 4)
      .select($"shard", $"c_id", $"links")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[scala.collection.Seq[Long]](2).map(_.toList).toList))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = build()
    val b = build()
    assert(a == b)
    // every node has a level-0 row; link degrees respect the 2m bound
    assert(a.forall(_._3.nonEmpty))
    assert(a.forall(_._3.head.size <= 32)) // m=16 → layer-0 cap 2m
    // some nodes live above layer 0 (the hierarchy exists)
    assert(a.count(_._3.size > 1) > 20)
  }

  test("sharded HNSW at ef=128 reaches the reference's recall regime " +
    "(≥0.95 on clustered embeddings) and beats a low-ef search") {
    val index = Hnsw.buildShards(clustered, "vec_id", "embedding",
      shards = 4).cache()
    val r128 = recallOf(cluTruth, Hnsw.topK(index, cluQ,
      "vec_id", "embedding", K, ef = 128))
    info(f"clustered hnsw shards=4 m=16 ef=128 recall@10=$r128%.3f")
    assert(r128 >= 0.95, s"hnsw ef=128 recall $r128")
    val r16 = recallOf(cluTruth, Hnsw.topK(index, cluQ,
      "vec_id", "embedding", K, ef = 16))
    info(f"clustered hnsw shards=4 m=16 ef=16  recall@10=$r16%.3f")
    assert(r128 >= r16, "ef must not reduce recall")
    // serve is deterministic
    val again = Hnsw.topK(index, cluQ, "vec_id", "embedding", K, ef = 128)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    val first = Hnsw.topK(index, cluQ, "vec_id", "embedding", K, ef = 128)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSet
    assert(again == first)
    index.unpersist()
  }

  test("scatter-gather merge: a 1-shard index and a 4-shard index " +
    "retrieve the same high-sim neighbors for duplicate probes") {
    // exact duplicates planted across shard boundaries: the +10000000
    // twin of each id hashes to a different shard, so finding it
    // proves the cross-shard merge path
    val base = clustered.filter($"vec_id" < 200)
    val twins = base.select(($"vec_id" + 10000000L).as("vec_id"),
      $"embedding")
    val corpus = base.unionByName(twins)
    val q = base.filter($"vec_id" < 20)
    def hits(shards: Int) = Hnsw.topK(
        Hnsw.buildShards(corpus, "vec_id", "embedding", shards),
        q, "vec_id", "embedding", k = 1, ef = 64)
      .select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val one = hits(1)
    val four = hits(4)
    (0L until 20L).foreach { id =>
      assert(one(id) == id + 10000000L, s"1-shard top-1 for $id: ${one(id)}")
      assert(four(id) == id + 10000000L, s"4-shard top-1 for $id: ${four(id)}")
    }
  }
}
