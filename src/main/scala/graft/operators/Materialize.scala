package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Compute-once materialization of a shared intermediate.
  *
  * Catalyst's exchange reuse does not fire across differently-aliased
  * (or differently-pruned) consumers of the same subtree, so a shared
  * expensive intermediate (signature aggregates, tf tables, iterative
  * labels) must be materialized explicitly or it recomputes per branch.
  *
  * Two strategies, picked by `spark.graft.materialize`:
  *  - `local` (default): `localCheckpoint(eager = false)` — fastest
  *    (executor-memory blocks, lineage truncated, no extra job), but
  *    the blocks are NON-RESILIENT: on a real cluster an executor loss
  *    makes the truncated lineage unrecoverable and fails the job.
  *    Right for local[]/tests/bench.
  *  - `resilient`: a reliable `checkpoint(eager = false)` when the
  *    session has a checkpoint dir (blocks on the shared FS survive any
  *    executor loss, lineage truncated for iterative loops), else
  *    `persist(DISK_ONLY)` (blocks recomputable from retained lineage).
  *    Right for multi-executor clusters — set
  *    `spark.graft.materialize=resilient` plus
  *    `sparkContext.setCheckpointDir(...)` in cluster submits.
  *
  * Laziness matters either way: an EAGER checkpoint schedules an extra
  * materialization job (~0.3-1.5 s measured locally) that the first
  * consumer action would have filled anyway.
  */
object Materialize {
  val ModeKey = "spark.graft.materialize"

  def apply(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ModeKey).getOrElse("local") match {
      case "resilient" =>
        if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint(eager = false)
        else df.persist(StorageLevel.DISK_ONLY)
      case _ => df.localCheckpoint(eager = false)
    }
}
