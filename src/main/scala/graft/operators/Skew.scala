package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact top-k per group for LOW-cardinality groups, two-phase. A
    * single `row_number` window over a 5-value group column sends every
    * row of a group to ONE task — at 100 TB that is 5 tasks each
    * sorting a fifth of the table. Phase 1 takes a local top-k within
    * (group, salt-of-`saltCol`) — the shuffle spreads over
    * groups×`salt` keys and each task sorts 1/salt of a group; phase 2
    * ranks only the surviving ≤ groups·salt·k candidate rows. Exact
    * for any k (a group's true top-k rows are each top-k within their
    * own salt slice); the salt is a deterministic hash of `saltCol`,
    * so reruns produce identical slices. Output: input columns + `rn`
    * (long, 1-based rank within the group by `orderCols`).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, saltCol: Column,
                   k: Int, orderCols: Seq[Column],
                   salt: Int = 64): DataFrame = {
    val localW = Window
      .partitionBy(col(groupCol),
        pmod(xxhash64(saltCol), lit(salt)).cast("int"))
      .orderBy(orderCols: _*)
    val globalW = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__lrn", row_number().over(localW))
      .filter(col("__lrn") <= k)
      .drop("__lrn")
      .withColumn("rn", row_number().over(globalW).cast("long"))
      .filter(col("rn") <= k)
  }
}
