package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bucketed

/** Bucketed co-located joins: the join and the keyed aggregation
  * after it must run with ZERO exchanges when both sides are bucketed
  * on their join keys, and results must equal the plain (shuffled)
  * computation.
  */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("bucketed equi-join + keyed aggregation run with zero " +
    "exchanges and match the unbucketed result") {
    val s = spark
    import s.implicits._
    val dim = (0L until 500L).map(i => (i, s"name-$i")).toDF("k", "name")
    val fact = (0L until 5000L).map(i => (i % 500L, i.toDouble))
      .toDF("fk", "v")
    val d1 = java.nio.file.Files.createTempDirectory("bk-dim").toString
    val d2 = java.nio.file.Files.createTempDirectory("bk-fact").toString
    Bucketed.writeBucketed(dim, "bk_dim", d1, "k", 8)
    Bucketed.writeBucketed(fact, "bk_fact", d2, "fk", 8)

    val joined = Bucketed.cogroupJoin(spark, "bk_fact", "fk",
      "bk_dim", "k")
    val agg = joined.groupBy($"k", $"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    assert(Bucketed.exchangeCount(agg) == 0,
      "bucketed join+agg must not shuffle:\n" +
        agg.queryExecution.executedPlan.toString)

    val plain = fact.join(dim, $"fk" === $"k")
      .groupBy($"k", $"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
    val a = agg.orderBy($"k").collect().map(_.toSeq)
    val b = plain.orderBy($"k").collect().map(_.toSeq)
    assert(a.length == 500 && a.sameElements(b))
    spark.sql("DROP TABLE IF EXISTS bk_dim")
    spark.sql("DROP TABLE IF EXISTS bk_fact")
  }

  test("a non-bucketed side forces the exchange back — the probe " +
    "detects it") {
    val s = spark
    import s.implicits._
    val dim = (0L until 100L).map(i => (i, s"n$i")).toDF("k", "name")
    val d1 = java.nio.file.Files.createTempDirectory("bk-f2").toString
    val fact = (0L until 1000L).map(i => (i % 100L, 1.0)).toDF("fk", "v")
    Bucketed.writeBucketed(fact, "bk_fact2", d1, "fk", 8)
    val j = spark.table("bk_fact2").hint("merge")
      .join(dim, $"fk" === $"k")
    assert(Bucketed.exchangeCount(j) > 0)
    spark.sql("DROP TABLE IF EXISTS bk_fact2")
  }
}
