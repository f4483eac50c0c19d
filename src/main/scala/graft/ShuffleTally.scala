package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric tally for scale evidence: accumulates shuffle
  * read/write bytes and spill across all tasks, so a harness (Bench's
  * per-query deltas, ScaleSpec's regression guards) can MEASURE the
  * shuffle claims SCALE.md makes instead of asserting them from plan
  * shape alone. Counters are monotonic; callers snapshot before/after
  * a job and subtract.
  */
class ShuffleTally extends SparkListener {
  private val write = new AtomicLong
  private val read = new AtomicLong
  private val spilled = new AtomicLong
  private val input = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      input.addAndGet(m.inputMetrics.bytesRead)
      ()
    }
  }

  /** `input` = source-scan bytes actually read (task input metrics) —
    * the evidence scan-pruning claims (pushed In()/bloom row-group
    * skipping) are measured by, where shuffle bytes can't see them.
    */
  case class Snapshot(write: Long, read: Long, spilled: Long,
                      input: Long = 0L) {
    def -(o: Snapshot): Snapshot =
      Snapshot(write - o.write, read - o.read, spilled - o.spilled,
        input - o.input)
  }

  /** Current totals, after draining the listener bus so in-flight
    * task-end events are counted. If the bus doesn't drain within the
    * bridge timeout (a busy bus under another listener), the snapshot
    * falls back to the current counter values — a slightly-stale byte
    * delta, never an aborted bench run.
    */
  def snapshot(sc: SparkContext): Snapshot = {
    org.apache.spark.graftbridge.ListenerBridge.drain(sc): Unit
    Snapshot(write.get, read.get, spilled.get, input.get)
  }
}

object ShuffleTally {
  /** Install a tally on the context (remove with
    * `sc.removeSparkListener`).
    */
  def install(sc: SparkContext): ShuffleTally = {
    val t = new ShuffleTally
    sc.addSparkListener(t)
    t
  }
}
