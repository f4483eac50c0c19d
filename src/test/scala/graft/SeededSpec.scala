package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Seeded

/** Seeded determinism properties on top of the q69/q70 oracles. */
class SeededSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("shuffle is a per-group permutation, stable per seed") {
    val a = Seeded.shuffle(docs, "source", "doc_id", "s1")
    // permutation: ranks within each group are exactly 1..n
    val bad = a.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"),
        countDistinct("rank").as("d"))
      .filter(col("n") =!= col("mx") || col("n") =!= col("d"))
    assert(bad.count() == 0)
    // same seed -> same order; different seed -> different order
    val a2 = Seeded.shuffle(docs, "source", "doc_id", "s1")
    assert(a.exceptAll(a2).count() == 0)
    val b = Seeded.shuffle(docs, "source", "doc_id", "s2")
    assert(a.exceptAll(b).count() > 0)
  }

  test("normal draws have ~N(0,1) moments and are seed-stable") {
    import spark.implicits._
    val n = 4000
    val z = spark.range(n)
      .select(Seeded.normalDraw(col("id"), lit(0), "s1").as("z"))
    val Array(mean, variance) =
      z.agg(avg($"z"), var_pop($"z")).head.toSeq.toArray.map {
        case d: Double => d
      }
    assert(math.abs(mean) < 0.05, s"mean $mean")
    assert(variance > 0.9 && variance < 1.1, s"variance $variance")
    // draws are in the Irwin-Hall support and hit both tails
    val stats = z.agg(min($"z"), max($"z")).head
    assert(stats.getDouble(0) >= -4.9 && stats.getDouble(0) < -2.0)
    assert(stats.getDouble(1) <= 4.9 && stats.getDouble(1) > 2.0)
    // bit-stability: re-evaluation yields identical doubles
    val z2 = spark.range(n)
      .select(Seeded.normalDraw(col("id"), lit(0), "s1").as("z"))
    assert(z.exceptAll(z2).count() == 0)
  }

  test("voicePick: deterministic, pool-respecting, covers all voices") {
    import spark.implicits._
    val df = spark.range(400).select(col("id"),
      when(pmod(col("id"), lit(2)) === 0, "male").otherwise("female")
        .as("gender"))
      .withColumn("voice", Seeded.voicePick(col("gender"), col("id")))
    val byGender = df.groupBy("gender")
      .agg(collect_set($"voice").as("voices")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    // each gender uses exactly its own 4-voice pool (200 draws cover it)
    assert(byGender("male") == Seeded.maleVoices.toSet)
    assert(byGender("female") == Seeded.femaleVoices.toSet)
    // re-evaluation is identical (keyed draw, not process randomness)
    val again = spark.range(400).select(col("id"),
      when(pmod(col("id"), lit(2)) === 0, "male").otherwise("female")
        .as("gender"))
      .withColumn("voice", Seeded.voicePick(col("gender"), col("id")))
    assert(df.exceptAll(again).count() == 0)
    // null key → null voice
    val nullOut = Seq(("male", null: java.lang.Long)).toDF("gender", "key")
      .select(Seeded.voicePick($"gender", $"key")).head
    assert(nullOut.isNullAt(0))
  }
}
