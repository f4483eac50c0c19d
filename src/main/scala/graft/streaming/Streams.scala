package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.operators.Upsert

/** Structured Streaming re-expression of the reference's polling-sensor
  * incremental machinery (SURVEY.md §2.10 ST1-ST6): the 60s/120s/300s
  * Dagster sensors (embedding_sensors.py:18, article_sensors.py:15)
  * become micro-batch triggers, the "backfill every 6h" dual mode
  * (ST4) is `Trigger.AvailableNow`, run-key dedup (ST3) is upsert
  * idempotency, and the state-machine column patches (ST2) run inside
  * `foreachBatch`. Event-time windows carry watermarks so the same
  * aggregations Events.scala runs in batch hold under late data.
  */
object Streams {

  case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionState(sessStart: Long, lastTs: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** ST1+ST2+ST3: the incremental micro-batch runner — stream in, apply
    * the stage transform, MERGE into the keyed table. `AvailableNow`
    * drains the backlog once (the sensor's backfill mode);
    * `Trigger.ProcessingTime("60 seconds")` reproduces the polling
    * cadence. Upsert idempotency makes replayed batches safe — the
    * reference gets the same guarantee from Mongo `$set` upserts.
    */
  def incrementalUpsert(input: DataFrame, stage: DataFrame => DataFrame,
                        tablePath: String, keys: Seq[String],
                        checkpoint: String,
                        trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val sink: (Dataset[Row], Long) => Unit = (batch, _) =>
      Upsert.mergeIntoTable(batch.sparkSession, tablePath,
        stage(batch.toDF()), keys, patch = true)
    input.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
  }

  /** ST3: exactly-once work-item admission — the reference dedups
    * sensor run submissions by `run_key = f(url)` (article_sensors.py:71
    * et al.); in Structured Streaming that is dropDuplicates on the key
    * with a watermark bounding the dedup state (keys older than the
    * horizon are evicted — unbounded state is the naive version's
    * 100 TB failure mode).
    */
  def dedupedStream(input: DataFrame, keyCol: String, tsCol: String,
                    watermark: String): DataFrame =
    input.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming incremental dedup — the ingest-dedup loop as a
    * micro-batch sink: each batch of (id, text) docs computes its own
    * minhash signatures, emits near-dup candidates against the
    * persisted corpus signature index
    * ([[graft.operators.Dedup.incrementalCandidates]] — broadcast
    * delta, ONE index scan, zero index shuffle), appends the
    * candidates, then appends its signatures to the index so later
    * batches see them. The corpus is signed exactly once across the
    * stream's lifetime. Replayed batches re-append the same candidate
    * pairs (and duplicate signature rows); downstream consumers
    * dedupe on (id_a, id_b) — the same run-key idempotency story as
    * [[dedupedStream]], applied at the output instead of the input.
    */
  def streamingDedup(input: DataFrame, idCol: String, textCol: String,
                     indexPath: String, candidatesPath: String,
                     checkpoint: String,
                     trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    import graft.operators.Dedup
    val sink: (Dataset[Row], Long) => Unit = (batch, _) => {
      val spark = batch.sparkSession
      // lazy materialization: the signatures feed two write actions below
      val deltaSigs = graft.operators.Materialize(
        Dedup.minhashSignatures(batch.toDF(), textCol, idCol))
      // resolve against the PATH's filesystem, not fs.defaultFS — an
      // index on another scheme (s3a vs file) would otherwise throw
      // "Wrong FS" or silently answer exists() against the wrong store
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val index =
        if (fs.exists(new org.apache.hadoop.fs.Path(indexPath)))
          spark.read.parquet(indexPath)
        else deltaSigs.limit(0) // first batch: delta-delta pairs only
      Dedup.incrementalCandidates(index, deltaSigs)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(candidatesPath)
      deltaSigs.write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(indexPath)
    }
    input.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
  }

  /** Streaming sketch-table maintenance — the streaming twin of
    * `Sketches.sketchTable` (q82's build pass): each micro-batch
    * builds its own per-group HLL sketches (one scan of the batch)
    * and APPENDS them as new slice rows; readers roll the slices up
    * with `Sketches.mergeEstimate`, which reads sketch BYTES only.
    * Merging is associative and order-independent, so the streamed
    * table answers exactly what a batch build over the union would —
    * without the stream ever rescanning history (the q80/IVM shape,
    * for distinct counts). Appends are per-batch files; compact with
    * `Layout.compact` when slices accrete.
    */
  def incrementalSketch(input: DataFrame, groupCols: Seq[String],
                        valueCol: String, tablePath: String,
                        checkpoint: String, lgK: Int = 12,
                        trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val sink: (Dataset[Row], Long) => Unit = (batch, _) =>
      graft.operators.Sketches
        .sketchTable(batch.toDF(), groupCols, valueCol, lgK)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .parquet(tablePath)
    input.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
  }

  /** Watermarked tumbling window aggregate — the streaming twin of
    * `Events.tumbling` (same output schema, append-mode safe: a window
    * is emitted once the watermark passes its end).
    */
  def tumbling(events: DataFrame, tsCol: String, groupCol: String,
               valueCol: String, width: String = "1 hour",
               watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width).as("w"), col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(groupCol),
        col("cnt"), col("sum_value"))

  /** Watermarked stream-stream interval join: each right-side event
    * joined to left-side events of the same key within a trailing time
    * bound. Both sides carry watermarks so the join state is bounded —
    * Spark evicts buffered rows once the watermark passes the interval
    * (the unbounded-state trap of naive stream joins). Inputs must
    * expose (keyCol, tsCol); output = purchase rows with their
    * attributed click columns.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lookback: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, tsCol, lookback, watermark,
      "inner")

  /** [[intervalJoin]]'s LEFT OUTER arm: an unmatched left row emits
    * exactly once, with NULL right columns, when the watermark passes
    * its join window (so left state can provably never match again —
    * Spark's stream-stream outer contract). Both sides carry the
    * watermark and the two-sided time-range constraint, which is what
    * lets the engine expire state; the null emission itself rides the
    * no-data micro-batch that fires when a later batch (or a sentinel
    * row — q132's finalization trick) advances the watermark.
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame, keyCol: String,
                        tsCol: String, lookback: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, tsCol, lookback, watermark,
      "left_outer")

  /** [[intervalJoin]]'s RIGHT OUTER arm — the mirror contract: an
    * unmatched RIGHT row (a purchase with no click in its trailing
    * window) emits exactly once, with NULL left columns, after the
    * watermark passes the last instant a matching left row could
    * still arrive.
    */
  def intervalJoinRightOuter(left: DataFrame, right: DataFrame,
                             keyCol: String, tsCol: String,
                             lookback: String = "1 hour",
                             watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, tsCol, lookback, watermark,
      "right_outer")

  /** [[intervalJoin]]'s FULL OUTER arm: BOTH sides' unmatched rows
    * emit exactly once with NULL opposite columns once their state
    * provably cannot match (watermark past the join window) — the
    * attribution-pipeline completeness contract: every click AND
    * every purchase appears in the output exactly once per match or
    * once unmatched. Same shared body: the interval condition and
    * watermark handling cannot desynchronize across the four arms.
    */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame,
                            keyCol: String, tsCol: String,
                            lookback: String = "1 hour",
                            watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, tsCol, lookback, watermark,
      "full_outer")

  // one body for both arms — the interval condition and watermark
  // handling must never desynchronize between inner and outer
  private def intervalJoinImpl(left: DataFrame, right: DataFrame,
                               keyCol: String, tsCol: String,
                               lookback: String, watermark: String,
                               joinType: String): DataFrame = {
    val l = left.withWatermark(tsCol, watermark).alias("l")
    val r = right.withWatermark(tsCol, watermark).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"l.$tsCol BETWEEN r.$tsCol - INTERVAL $lookback AND r.$tsCol"),
      joinType)
  }

  /** Custom sessionization state machine via flatMapGroupsWithState:
    * per key, events extend the open session while within `gapMinutes`;
    * a later event (or event-time timeout) closes it and emits one
    * `ClosedSession` row. The batch oracle is `Events.sessionStats` —
    * same gap semantics, windowed-SQL formulation.
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int)
      : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, new Timestamp(s.sessStart),
              new Timestamp(s.lastTs), s.n))
          } else {
            // micro-batch iterators carry no order guarantee
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[ClosedSession]
            var st = state.getOption
            sorted.foreach { e =>
              st match {
                case Some(s) if e.ts.getTime - s.lastTs <= gapMs =>
                  st = Some(s.copy(
                    lastTs = math.max(s.lastTs, e.ts.getTime), n = s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(uid, new Timestamp(s.sessStart),
                    new Timestamp(s.lastTs), s.n)
                  st = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
                case None =>
                  st = Some(SessionState(e.ts.getTime, e.ts.getTime, 1))
              }
            }
            st.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
