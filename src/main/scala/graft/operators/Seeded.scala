package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded, reproducible variants of the reference's nondeterministic
  * reliability hacks (SURVEY §7.4): `random.shuffle` of feed entries
  * (T5, raw_articles.py) and the random-normal fake-embedding fallback
  * (F14, embedding_utils.py:98-100). The reference draws from process
  * randomness; this engine derives every draw from md5 of
  * (seed, key) — identical across runs, engines, partitionings, and
  * cluster sizes, which is what makes the ops testable and their
  * outputs cacheable at 100 TB.
  */
object Seeded {

  /** Deterministic per-group shuffle: ranks rows of each `groupCol`
    * partition in md5(seed ‖ key) order (key as final tie-break). The
    * T5 semantics — "process entries in random order" — with a seed
    * instead of process randomness. One shuffle on the group key; no
    * global sort.
    */
  def shuffle(df: DataFrame, groupCol: String, keyCol: String,
      seed: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(
      md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))),
      col(keyCol))
    df.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** 1/sqrt(8/12): normalizes an 8-fold Irwin-Hall sum to unit
    * variance. Plain decimal literal so both engines parse the same
    * IEEE double.
    */
  val IrwinHallNorm = "0.816496580927726"

  /** One standard-normal-ish draw for (seed, id, i): eight 16-bit
    * uniforms from one md5, Irwin-Hall summed and normalized.
    * Everything before the final division is a dyadic rational
    * (k/2^16 sums, exact in binary double), and the division is
    * correctly rounded from the same operands in any IEEE engine —
    * so the output is bit-identical cross-engine, no rounding guard
    * needed. (A Box–Muller variant would hit ln/cos libm ulps.)
    */
  def normalDraw(id: Column, i: Column, seed: String): Column = {
    val h = md5(concat(lit(seed), lit(":"), id.cast("string"),
      lit(":"), i.cast("string")))
    val parts = (0 until 8).map(k =>
      conv(substring(h, 1 + 4 * k, 4), 16, 10).cast("double") / 65536.0)
    (parts.reduce(_ + _) - 4.0) / IrwinHallNorm.toDouble
  }

  /** F14 stand-in: a `dim`-element seeded normal vector per id. */
  def normalVec(id: Column, dim: Int, seed: String): Column =
    transform(sequence(lit(0), lit(dim - 1)), i => normalDraw(id, i, seed))
}
