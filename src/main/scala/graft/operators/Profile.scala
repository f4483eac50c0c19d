package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column null counts, exact distinct counts and
  * min/max in ONE scan — the data-quality summary every warehouse
  * exposes (DESCRIBE/SUMMARIZE), computed relationally. All requested
  * columns' aggregates run in a single `agg` (Catalyst expands the
  * multiple COUNT DISTINCTs via one Expand — still one pass over the
  * data), then the wide single row unpivots to (column, stat) rows.
  * Min/max surface as strings so heterogeneous column types share one
  * output schema. For approximate-but-mergeable distinct counts at
  * 100 TB, use [[Sketches]] instead — this operator is the exact,
  * one-shot form.
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.table: no columns requested")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}__nulls"),
        countDistinct(col(c)).as(s"__${c}__nd"),
        min(col(c)).cast("string").as(s"__${c}__min"),
        max(col(c)).cast("string").as(s"__${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__${c}__nulls").as("n_nulls"),
        col(s"__${c}__nd").as("n_distinct"),
        col(s"__${c}__min").as("min_val"),
        col(s"__${c}__max").as("max_val"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
