package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.{Hnsw, Similarity}

/** Measured recall@10 curves for the ANN family — the evidence behind
  * SURVEY's "LSH/IVF/IVF-PQ substitute for the reference's HNSW
  * index" claim (the reference searches with hnsw_ef=128, recall
  * ≈ 0.95+).
  *
  * Two regimes, both measured every round:
  *  - the sf0.01 embeddings FIXTURE is near-uniform random 64-d —
  *    the theoretical WORST case for any ANN structure (pairwise
  *    similarities concentrate, neighbors are barely separated, and
  *    recall ≈ fraction-of-corpus-scanned is the information-theoretic
  *    ceiling; HNSW degrades on uniform data the same way). Floors
  *    here guard regression, not quality.
  *  - CLUSTERED 64-d data (20 clusters, σ=0.15 — the shape of real
  *    sentence-transformer embeddings, which is what the reference
  *    actually indexes) is where the HNSW-parity claim lives: IVF and
  *    IVF-PQ reach the ≥0.95 regime probing a small cell fraction.
  * Curves print per run so SCALE.md's table can be refreshed from
  * test output.
  */
class RecallCurveSpec extends AnyFunSuite {
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

  // --- worst case: the near-uniform random fixture -----------------
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val embQ = emb.filter($"vec_id" < 50)
  private lazy val embTruth =
    topSet(Similarity.bruteForceTopK(embQ, emb, "vec_id", "embedding", K))

  // --- representative case: clustered 64-d (what HNSW indexes) -----
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

  test("uniform fixture (worst case): curves are monotone in effort; " +
    "multiprobe always buys recall") {
    val lsh = (for {
      bits <- Seq(4, 6, 8); mp <- Seq(false, true)
    } yield {
      val r = recallOf(embTruth, Similarity.lshTopK(embQ, emb,
        "vec_id", "embedding", K, dim = 64, bits = bits, multiprobe = mp))
      info(f"uniform lsh bits=$bits multiprobe=$mp recall@10=$r%.3f")
      ((bits, mp), r)
    }).toMap
    Seq(4, 6, 8).foreach { b =>
      assert(lsh((b, true)) >= lsh((b, false)), s"bits=$b")
    }
    val ivfModel = Similarity.fitIvf(emb, "embedding", nlist = 64)
    val ivf = Seq(1, 4, 16, 32).map { np =>
      val r = recallOf(embTruth, Similarity.ivfTopK(ivfModel, embQ, emb,
        "vec_id", "embedding", K, nprobe = np))
      info(f"uniform ivf nlist=64 nprobe=$np%2d recall@10=$r%.3f")
      np -> r
    }.toMap
    // on uniform data recall tracks the scanned fraction — the curve
    // must still be monotone, and probing half the cells must clear
    // the scanned-fraction ceiling's neighborhood
    assert(ivf(4) >= ivf(1) && ivf(16) >= ivf(4) && ivf(32) >= ivf(16))
    assert(ivf(32) >= 0.80, s"ivf nprobe=32/64 recall ${ivf(32)}")
  }

  test("clustered 64-d (the HNSW regime): IVF and IVF-PQ reach ≥0.95 " +
    "probing a small cell fraction; LSH multiprobe competitive") {
    val ivfModel = Similarity.fitIvf(clustered, "embedding", nlist = 32)
    val ivf = Seq(1, 2, 4, 8).map { np =>
      val r = recallOf(cluTruth, Similarity.ivfTopK(ivfModel, cluQ,
        clustered, "vec_id", "embedding", K, nprobe = np))
      info(f"clustered ivf nlist=32 nprobe=$np recall@10=$r%.3f")
      np -> r
    }.toMap
    assert(ivf(4) >= 0.95, s"clustered ivf nprobe=4/32 recall ${ivf(4)}")

    val ivfpq = (for { k <- Seq(16, 64); rf <- Seq(4, 8, 16) } yield {
      val pqModel = Similarity.fitIvfPq(clustered, "embedding",
        nlist = 16, m = 8, k = k)
      val index = Similarity.ivfPqEncode(pqModel, clustered,
        "vec_id", "embedding")
      val r = recallOf(cluTruth, Similarity.ivfPqTopK(pqModel, cluQ,
        index, clustered, "vec_id", "embedding", K,
        nprobe = 4, rerankFactor = rf))
      info(f"clustered ivfpq nlist=16 k=$k nprobe=4 rerank=$rf " +
        f"recall@10=$r%.3f")
      ((k, rf), r)
    }).toMap
    assert(ivfpq((64, 8)) >= 0.9,
      s"clustered ivfpq k=64 rerank=8 recall ${ivfpq((64, 8))}")

    val lshR = recallOf(cluTruth, Similarity.lshTopK(cluQ, clustered,
      "vec_id", "embedding", K, dim = 64, bits = 8))
    info(f"clustered lsh bits=8 multiprobe=true recall@10=$lshR%.3f")
    assert(lshR >= 0.5, s"clustered lsh recall $lshR")
  }

  test("true HNSW (round 9): the reference's own index structure, " +
    "measured in BOTH regimes at its hnsw_ef=128 operating point") {
    // prepare + cache once, serve every ef point residently — the
    // cross-batch serve shape (one index exchange total, not per call)
    val cluIdx = Hnsw.prepare(Hnsw.buildShards(clustered, "vec_id",
      "embedding", shards = 4)).cache()
    val clu = Seq(16, 64, 128).map { ef =>
      val r = recallOf(cluTruth, Hnsw.topKResident(cluIdx, cluQ,
        "vec_id", "embedding", K, ef = ef))
      info(f"clustered hnsw shards=4 m=16 ef=$ef%3d recall@10=$r%.3f")
      ef -> r
    }.toMap
    assert(clu(128) >= 0.95, s"clustered hnsw ef=128 recall ${clu(128)}")
    assert(clu(128) >= clu(16), "ef must not reduce recall")
    cluIdx.unpersist()
    // uniform worst case: HNSW degrades like every ANN structure, but
    // the ef=128 beam on 5000 rows still has to beat low-effort IVF
    val uniIdx = Hnsw.prepare(Hnsw.buildShards(emb, "vec_id",
      "embedding", shards = 4)).cache()
    val uni = recallOf(embTruth, Hnsw.topKResident(uniIdx, embQ,
      "vec_id", "embedding", K, ef = 128))
    info(f"uniform   hnsw shards=4 m=16 ef=128 recall@10=$uni%.3f")
    assert(uni >= 0.5, s"uniform hnsw ef=128 recall $uni")
    uniIdx.unpersist()
  }
}
