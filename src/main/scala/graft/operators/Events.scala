package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time / incremental operators over the `events` table — the
  * Spark-native re-expression of the reference's sensor+state-machine
  * incremental semantics (SURVEY.md §2.10 ST1-ST6) plus the event-time
  * windows a real engine needs (tumbling / sliding / session) and an
  * as-of join.
  */
object Events {

  /** Tumbling event-time window aggregate: (window_start, group, count,
    * sum). Same result batch or streaming (`window()` is shared).
    */
  def tumbling(df: DataFrame, tsCol: String, groupCol: String,
               valueCol: String, width: String = "1 hour"): DataFrame =
    df.groupBy(window(col(tsCol), width).as("w"), col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(groupCol),
        col("cnt"), col("sum_value"))

  /** Sliding event-time window aggregate. */
  def sliding(df: DataFrame, tsCol: String, groupCol: String,
              valueCol: String, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    df.groupBy(window(col(tsCol), width, slide).as("w"), col(groupCol))
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(groupCol),
        col("cnt"), col("sum_value"))

  /** Session stats per key with a fixed inactivity gap: a new session
    * starts when the time since the previous event exceeds `gap`.
    * Pure window functions (gaps-and-islands) so the same code is the
    * batch oracle for `session_window()` streaming jobs.
    * Output: (key, session_cnt, max_session_events, round-tripped total).
    */
  def sessionStats(df: DataFrame, tsCol: String, keyCol: String,
                   tieCol: String, gapMinutes: Int = 30): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val gapExpr = (unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1)
      .over(byKey))) > gapMinutes * 60L * 1000000L
    val marked = df.withColumn("new_sess",
      when(lag(col(tsCol), 1).over(byKey).isNull || gapExpr, 1).otherwise(0))
    val sessioned = marked.withColumn("sess_id",
      sum(col("new_sess")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
    sessioned.groupBy(col(keyCol), col("sess_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("session_cnt"),
        max(col("n")).as("max_session_events"),
        sum(col("n")).as("total_events"))
  }

  /** As-of join: for each left row, the most recent right row with
    * `right.ts <= left.ts` and equal key. Implemented as a tagged union
    * + one window pass (last non-null looking back) — linear, one
    * shuffle on the key, no range cross-product; survives arbitrary
    * skew via the same AQE paths as any windowed plan.
    * Output: left rows + `asof_<rightTsCol>` / `asof_<rightIdCol>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightIdCol: String): DataFrame = {
    val ridType = right.schema(rightIdCol).dataType
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(1).as("__side"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(ridType).as("__rid"))
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(0).as("__side"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      col(rightIdCol).as("__rid"))
    // right rows sort before left rows at equal ts: a match at the same
    // timestamp is visible to the left row (<= semantics)
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matchStruct = when(col("__side") === 0,
      struct(col("__ts").as("ts"), col("__rid").as("id")))
    l.unionByName(r)
      .withColumn("__match", last(matchStruct, ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c")) :+
        col("__match.ts").as("asof_ts") :+ col("__match.id").as("asof_id"): _*)
  }

  /** Banded inequality join: all (left, right) pairs with
    * `|left.v − right.v| ≤ eps`. A naive inequality join plans as a
    * broadcast-nested-loop / cartesian — the classic scale killer.
    * Bucketing fixes the shape: both sides key on `floor(v / eps)`,
    * the right side replicates into its bucket and both neighbors
    * (any pair within eps spans at most adjacent buckets), and an
    * equi-join + exact filter recovers precisely the band. One
    * shuffle keyed on the bucket; fan-in per key = rows within an
    * eps-wide slice of the value distribution — the same
    * bucket-the-continuum trick as the LSH/IVF candidate joins,
    * applied to a scalar. Columns are prefixed `l_` / `r_`.
    *
    * Bucket width is 2·eps, not eps: an in-band pair's true quotients
    * then differ by ≤ 0.5, so even a floor() that rounds a
    * boundary-straddling quotient the "wrong" way by an ulp cannot
    * push the computed buckets more than one apart — candidate
    * completeness survives FP rounding. The final filter is exact
    * arithmetic on the original values either way.
    */
  def bandJoin(left: DataFrame, right: DataFrame, leftValCol: String,
               rightValCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val width = 2 * eps
    val l = left.select(
      left.columns.map(c => col(c).as(s"l_$c")) :+
        floor(col(leftValCol) / width).cast("long").as("__b"): _*)
    val r0 = right.select(
      right.columns.map(c => col(c).as(s"r_$c")): _*)
    val r = r0.withColumn("__b",
      explode(array(Seq(-1, 0, 1).map(d =>
        floor(col(s"r_$rightValCol") / width).cast("long") + d): _*)))
    l.join(r, Seq("__b"))
      .filter(abs(col(s"l_$leftValCol") - col(s"r_$rightValCol")) <= eps)
      .drop("__b")
  }

  /** ST7 rate limiting, re-expressed for batch: the reference throttles
    * side-effect calls with retry/wait loops (tenacity `wait_fixed`,
    * upload_audio_utils.py:12-16) — imperative, wall-clock-coupled,
    * untestable. The batch equivalent assigns each request its
    * ADMISSION time under a min-gap-per-key policy:
    * `admit_i = max(ts_i, admit_{i-1} + gap)` over each key's requests
    * in (ts, tieBreak) order. That recurrence looks sequential but
    * unfolds to `admit_i = gap·i + max_{j≤i}(ts_j − gap·j)` — a
    * running max over a monotone transform, i.e. two window passes,
    * one shuffle on the key. All arithmetic is exact long
    * microseconds (no FP), so the schedule is engine-reproducible.
    * Output: input + `admit_ts` (timestamp) + `wait_us` (long ≥ 0).
    */
  def rateLimit(df: DataFrame, keyCol: String, tsCol: String,
                gapMicros: Long, tieBreak: Column*): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: tieBreak: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("admit_ts", timestamp_micros(
        max(col("__us") - col("__rn") * gapMicros).over(cum) +
          col("__rn") * gapMicros))
      .withColumn("wait_us", unix_micros(col("admit_ts")) - col("__us"))
      .drop("__rn", "__us")
  }

  /** ST6 threshold gate: run the job only when at least `n` eligible
    * rows exist (related_articles_sensor.py:57-59's ≥50 gate). The one
    * deliberate driver-side action in the engine — a scheduling
    * decision, not a dataflow operator.
    */
  def thresholdGate(df: DataFrame, n: Long): Boolean =
    df.limit(n.toInt).count() >= n

  /** Rows needing refresh: ts < max(ts) − days (computed via a scalar
    * aggregate joined in, not a driver collect).
    */
  def staleRows(df: DataFrame, tsCol: String, days: Int): DataFrame = {
    val cut = df.agg((max(col(tsCol)) - expr(s"INTERVAL $days DAYS"))
      .as("__cut"))
    df.crossJoin(broadcast(cut)).filter(col(tsCol) < col("__cut"))
      .drop("__cut")
  }
}
