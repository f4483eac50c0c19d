package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables and the co-located join over them —
  * the storage-level half of shuffle elimination at 100 TB: a fact
  * table written `CLUSTERED BY (key) INTO n BUCKETS` pays its shuffle
  * ONCE at write time, and every subsequent equi-join or aggregation
  * keyed on the bucket column reads co-located partitions with NO
  * exchange. On a 1000-executor cluster this converts the nightly
  * "join orders to customers" from a full 2-sided shuffle of the
  * largest tables into a local merge per bucket — the single biggest
  * repeated-query win bucketing buys, and the reason warehouse layouts
  * bucket their fact tables on the dominant join key.
  *
  * Tables are EXTERNAL (explicit `path`) so the in-memory session
  * catalog carries only metadata — no writes land under the
  * process-relative warehouse dir. `sortBy` is applied with the
  * bucket key so single-file buckets read back pre-sorted.
  */
object Bucketed {

  /** write `df` as a bucketed+sorted external parquet table,
    * replacing any previous registration of `table`
    */
  def writeBucketed(df: DataFrame, table: String, dir: String,
                    key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet").mode("overwrite")
      .option("path", dir)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** co-located equi-join of two bucketed tables on their respective
    * bucket keys; the `merge` hint pins sort-merge (a broadcast would
    * hide the property being bought — at the scale bucketing targets,
    * neither side broadcasts)
    */
  def cogroupJoin(spark: SparkSession, leftTable: String, leftKey: String,
                  rightTable: String, rightKey: String,
                  how: String = "inner"): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), how)
  }

  /** exchange count in the EXECUTED plan — the spec/debug probe for
    * "this read was co-located" (0 = no shuffle anywhere)
    */
  def exchangeCount(df: DataFrame): Int = {
    val p = df.queryExecution.executedPlan.toString
    p.sliding("Exchange".length).count(_ == "Exchange")
  }
}
