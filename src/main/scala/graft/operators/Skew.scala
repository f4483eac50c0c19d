package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins. AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) handles most
  * hot keys; explicit salting is the deterministic fallback when one
  * key's rows exceed what a single task can hold even after AQE splits
  * — the classic hot-url / hot-topic case in a 100 TB fact table.
  */
object Skew {

  /** Salted equi-join: scatter the (large, skewed) `fact` side across
    * `salt` sub-keys and replicate the (small) `dim` side once per
    * sub-key, so a hot join key spreads over `salt` reducers instead of
    * one. Row-level salt comes from hashing the whole fact row id space
    * (`monotonically_increasing_id`), so the spread is uniform and
    * needs no knowledge of which keys are hot. Result is exactly the
    * plain join's output; cost is `salt`× replication of the dim side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
