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
}
