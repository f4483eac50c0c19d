package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; the shuffle tally
  * (graft.ShuffleTally) needs to drain it so per-query byte deltas are
  * complete before they are read. Same minimal-bridge pattern as
  * `org.apache.spark.sql.graftbridge.ColumnBridge`.
  */
object ListenerBridge {
  /** Block until all queued listener events are delivered. */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
