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

  /** EAGER lineage cut for iterative loops (PageRank, label
    * propagation): each round's result must be materialized before the
    * caller frees the previous round's blocks, or freeing them forces
    * a recompute of the whole chain. [[apply]]'s lazy forms cannot
    * guarantee that ordering, so loops route here instead:
    *  - `local` (default): eager `localCheckpoint()` — lineage
    *    truncated, blocks in executor memory/disk. Fast, NON-RESILIENT
    *    (an executor loss kills the job) — right for local[]/tests.
    *  - `resilient` + checkpoint dir: eager reliable `checkpoint()` —
    *    lineage truncated AND blocks on the shared FS, so a lost
    *    executor mid-run recovers instead of killing a multi-hour
    *    100 TB iteration. THE cluster configuration for iterative ops.
    *  - `resilient`, no checkpoint dir: replicated
    *    `persist(DISK_ONLY_2)` forced eager — a single executor loss
    *    is absorbed by the replica, and lineage is RETAINED as the
    *    recompute backstop. Lineage grows ~4× per round here, so this
    *    fallback is for bounded iteration counts (≤~10); set a
    *    checkpoint dir for anything longer.
    */
  def iterCut(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ModeKey).getOrElse("local") match {
      case "resilient" =>
        if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
          df.checkpoint()
        else { val p = df.persist(StorageLevel.DISK_ONLY_2); p.count(); p }
      case _ => df.localCheckpoint()
    }
}
