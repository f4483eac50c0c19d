package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: identical results to the plain join on heavily skewed
  * keys, with the shuffle keyed on (key, salt).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("saltedJoin output equals the plain join on 90%-hot-key data") {
    // 90% of fact rows share one key — the shape that melts one reducer
    val fact = (0 until 2000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong))
      .toDF("k", "v")
    val dim = (Seq("hotkey") ++ (0 until 7).map(i => s"key$i"))
      .zipWithIndex.map { case (k, i) => (k, s"dim$i") }.toDF("k", "d")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
      .select("k", "v", "d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hotkey") == 1800)
  }

  test("topKPerGroup equals the single-window top-k, ties and all") {
    val rnd = new scala.util.Random(7)
    // 3 groups, duplicate scores to exercise the id tie-break
    val df = (0 until 3000).map(i =>
      (s"g${i % 3}", i.toLong, rnd.nextInt(50).toDouble)).toDF("g", "id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val plain = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 7)
      .select("g", "rn", "id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = Skew.topKPerGroup(df, "g", $"id", k = 7,
        Seq($"score".desc, $"id".asc), salt = 16)
      .select("g", "rn", "id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase == plain)
    // k larger than some salt slices still exact
    val big = Skew.topKPerGroup(df, "g", $"id", k = 40,
        Seq($"score".desc, $"id".asc), salt = 64)
    assert(big.count() == 120)
  }

  test("topKAgg equals the single-window top-k across partitionings, " +
    "ties and all") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 3000).map(i =>
      (s"g${i % 3}", i.toLong, rnd.nextInt(40).toDouble))
      .toDF("g", "id", "score")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score".desc, $"id".asc)
    val plain = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 7)
      .select("g", "rn", "id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // the aggregator's survivor set and order must be independent of
    // partitioning/encounter order
    Seq(df, df.repartition(17), df.repartition(1),
        df.orderBy($"score".asc)).foreach { d =>
      val got = Skew.topKAgg(d, "g", "id", "score", k = 7)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(got == plain)
    }
    // k larger than a group: every row comes back, ranked
    val small = (0 until 5).map(i => ("g", i.toLong, i.toDouble))
      .toDF("g", "id", "score")
    val all = Skew.topKAgg(small, "g", "id", "score", k = 50)
      .orderBy("rn").collect()
    assert(all.length == 5 && all.head.getLong(2) == 4L) // best = highest
    // null scores are dropped, not a query-killing encoder error
    val withNulls = Seq(("g", 1L, Some(3.0)), ("g", 2L, None),
      ("g", 3L, Some(1.0))).toDF("g", "id", "score")
    val survivors = Skew.topKAgg(withNulls, "g", "id", "score", k = 5)
      .collect().map(_.getLong(2)).toSet
    assert(survivors == Set(1L, 3L))
  }

  test("topKAgg property: random scores with heavy ties always equal " +
    "the window formulation") {
    (0 until 4).foreach { trial =>
      val rnd = new scala.util.Random(41 + trial)
      // small score domain forces many k-boundary ties
      val df = (0 until 800).map(i =>
        (s"g${i % 4}", i.toLong, rnd.nextInt(6).toDouble))
        .toDF("g", "id", "score")
      val k = 1 + trial * 3
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"score".desc, $"id".asc)
      val plain = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= k).select("g", "rn", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = Skew.topKAgg(df.repartition(7 + trial), "g", "id",
          "score", k)
        .select("g", "rn", "id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == plain, s"trial $trial k=$k")
    }
  }
}
