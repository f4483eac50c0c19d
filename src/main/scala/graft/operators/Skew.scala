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

  /** Exact top-k per group via the bounded typed Aggregator
    * ([[graft.expressions.TopKAgg]]): each map task ships at most k
    * (score, id) pairs per group into the shuffle and nothing is ever
    * fully sorted — strictly less data movement than both the plain
    * window (whole group sorted on one task) and [[topKPerGroup]]'s
    * two-phase salted windows (whose local phase still sorts all
    * rows). The right shape when k is small and the group column's
    * cardinality is low. Ranks (score desc, id asc). Output:
    * (groupCol, rn, idCol, scoreCol); callers needing more payload
    * join back on the id.
    */
  def topKAgg(df: DataFrame, groupCol: String, idCol: String,
              scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new graft.expressions.TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long)]())
    // the tuple encoder's fields are primitive: a null score/id row
    // would kill the query, where the window formulation just sorts
    // nulls last — drop them explicitly (they cannot be top-k anyway)
    df.filter(col(scoreCol).isNotNull &&
        col(idCol).cast("long").isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long"))
        .as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(groupCol), (col("__pos") + 1).cast("long").as("rn"),
        col("__t._2").as(idCol), col("__t._1").as(scoreCol))
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
