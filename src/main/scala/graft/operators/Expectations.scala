package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates — the expectations report a corpus
  * refresh publishes next to its data (the Great-Expectations-shaped
  * check, but as plain Spark aggregates): each expectation is a row
  * predicate, every violation is COUNTED (never a job failure — a
  * 100 TB refresh wants the violation profile, not a stack trace at
  * row 3 billion), and the whole row-predicate battery runs in ONE
  * scan-side aggregate pass (conditional sums, map-side combined —
  * no shuffle beyond the final one-row exchange). Key-uniqueness
  * checks are genuinely distributive-resistant and pay one
  * aggregation shuffle per key set, kept separate so the cost is
  * explicit.
  */
object Expectations {

  /** A row violates when its predicate is NOT TRUE — false and NULL
    * both count (a null in `x >= 0` is exactly the dirty row the
    * gate exists to surface; expectations that tolerate nulls say so
    * in the predicate).
    */
  def check(df: DataFrame,
            expectations: Seq[(String, Column)],
            uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(expectations.nonEmpty || uniqueKeys.nonEmpty,
      "Expectations.check: nothing to check")
    val rowAggs = expectations.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"v_$name")
    }
    val rowReport: Option[DataFrame] =
      if (expectations.isEmpty) None
      else {
        // ONE whole-table aggregate row, exploded into report rows —
        // a per-expectation select would re-execute the scan per
        // branch (Catalyst does not reuse differently-pruned twins)
        val agg = df.agg(count(lit(1)).as("n_rows"), rowAggs: _*)
        val entries = expectations.map { case (name, _) =>
          struct(lit(name).as("expectation"), col("n_rows"),
            col(s"v_$name").as("n_violations"))
        }
        Some(agg.select(explode(array(entries: _*)).as("e"))
          .select(col("e.expectation"), col("e.n_rows"),
            col("e.n_violations")))
      }
    val keyReports = uniqueKeys.map { case (name, cols) =>
      val dupRows = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1L)
        .agg(coalesce(sum(col("__n")), lit(0L)).as("n_violations"))
      val n = df.agg(count(lit(1)).as("n_rows"))
      n.crossJoin(broadcast(dupRows))
        .select(lit(name).as("expectation"), col("n_rows"),
          col("n_violations"))
    }
    val all = (rowReport.toSeq ++ keyReports)
      .reduce(_ unionByName _)
    all.select(col("expectation"), col("n_rows"),
        col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("expectation"))
  }
}
