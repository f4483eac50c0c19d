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

  /** The reference's TTS voice pools (tts_utils.py:47-53). */
  val maleVoices: Seq[String] = Seq("alloy", "echo", "fable", "onyx")
  val femaleVoices: Seq[String] = Seq("shimmer", "coral", "nova", "sage")

  /** F15 deterministic voice pick (tts_utils.py:47-53): the reference
    * draws `random.choice` from four voices per gender — a fresh draw
    * per call, irreproducible. Here the draw is md5-keyed, so the same
    * (gender, key) always yields the same voice: 16 bits of
    * md5(seed ‖ key) mod 4 index the pool. Non-'male' genders take the
    * female pool, mirroring the reference's else branch; a null key
    * yields a null voice.
    */
  def voicePick(gender: Column, key: Column, seed: String = "s42"): Column = {
    val idx = pmod(
      conv(substring(md5(concat(lit(seed), lit(":"),
        key.cast("string"))), 1, 4), 16, 10).cast("long"), lit(4L))
    def pick(vs: Seq[String]) =
      element_at(array(vs.map(lit): _*), (idx + 1).cast("int"))
    // explicit null-key branch: element_at with a null ordinal trips an
    // optimizer-internal NPE (ConvertToLocalRelation projects the null
    // through a writer that assumes the literal array's non-nullable
    // element type), and the guard also documents the contract
    when(idx.isNull, lit(null).cast("string"))
      .when(gender === "male", pick(maleVoices))
      .otherwise(pick(femaleVoices))
  }
}
