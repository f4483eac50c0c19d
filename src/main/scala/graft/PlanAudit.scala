package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Suite-wide interpreted-expression inventory (optimization-guide §4 /
  * task rule 4): for every declared query, walk the FINAL physical
  * plan's expression trees and report every node that mixes in
  * `CodegenFallback` — the expressions whole-stage codegen cannot
  * compile, which run interpreted per row. Output is one line per
  * query (`name: expr[,expr…]` or `name: -`), suitable for committing
  * as the round's codegen evidence.
  *
  * Limits, stated so the inventory is honest: (1) iterative operators
  * truncate lineage per round, so only the FINAL frame's plan is
  * walked — their iteration bodies are audited via GRAFT_EXPLAIN_ITER
  * instead; (2) foreachBatch sink plans are invisible here;
  * (3) constructing a query executes its construction-time actions
  * (index writes, stream drains), so a full audit run costs about one
  * Verify pass.
  *
  * Usage: `sbt "runMain graft.PlanAudit"` (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY as in Bench).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    (SparkEntry.queries.toSeq ++ SparkEntry.benchOnly.toSeq)
      .sortBy(_._1)
      .filter(p => only.forall(_.exists(p._1.startsWith)))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val falls = scala.collection.mutable.SortedSet[String]()
          df.queryExecution.executedPlan.foreach { node =>
            node.expressions.foreach(_.foreach {
              case e: CodegenFallback => falls += e.prettyName
              case _ => ()
            })
          }
          println(s"[audit] $name: " +
            (if (falls.isEmpty) "-" else falls.mkString(",")))
        } catch {
          case e: Throwable =>
            println(s"[audit] $name: ERROR ${e.getClass.getSimpleName}")
        } finally {
          try graft.operators.Materialize.releaseAll(spark)
          catch { case _: Throwable => () }
          try TempDirs.cleanAll() catch { case _: Throwable => () }
        }
      }
    spark.stop()
  }
}
