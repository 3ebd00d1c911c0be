package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization via window functions: a session breaks where
  * the gap to the previous event exceeds `gapNanos`. Classic
  * lag + cumulative-sum-of-breaks construction — one shuffle on the
  * user key, all window work; pairs with the streaming variant in
  * [[graft.streaming.Streams.sessionize]] (same semantics, unbounded
  * input, O(active users) state).
  */
object Sessionize {

  /** @param tsCol  event time as epoch NANOS (long)
    * @param tieCol unique per-row column for deterministic ordering of
    *               equal timestamps */
  def batch(events0: DataFrame, userCol: String, tsCol: String,
            tieCol: String, valueCol: String,
            gapNanos: Long): DataFrame = {
    // native timestamp ts columns normalize to epoch nanos (matching
    // the gap unit); integral columns pass through with the caller's
    // unit, as before (see TimeCols)
    val events = events0.withColumn(tsCol,
      TimeCols.epochNanos(events0, tsCol))
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val cum = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev", lag(col(tsCol), 1).over(order))
      .withColumn("_new_sess",
        when(col("_prev").isNull || col(tsCol) - col("_prev") > gapNanos, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("_new_sess")).over(cum))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** Native-operator variant: Spark's built-in `session_window`
    * merge-on-gap sessions (the streaming-capable form — the same
    * call works under `groupBy` on a watermarked stream, which the
    * window-function islands in [[batch]] cannot). Differences from
    * [[batch]]: no tie column (sessions are set-merged, not
    * row-ordered), `session_end` is last event + gap per the
    * operator's contract (islands report the last event itself), and
    * event times are truncated to MICROS (the operator's timestamp
    * resolution). Bounds are epoch nanos, like [[batch]].
    *
    * UNIT CONTRACT, stricter than [[batch]]: [[batch]] is
    * unit-agnostic (its gap is taken in the caller's unit), but here
    * the gap is wall-clock seconds and the column feeds
    * `timestamp_micros(ts div 1000)`, so an integral column's unit
    * MUST be known — a silently-misread epoch-micros/seconds long
    * would compress every session ~10³/10⁹-fold. `tsUnit` makes the
    * unit an explicit declaration instead of an assumption:
    * "nanos" (default) | "micros" | "millis" | "seconds", applied to
    * INTEGRAL columns only (native timestamp columns carry their unit
    * exactly and ignore it). */
  def nativeSessionWindow(events0: DataFrame, userCol: String,
                          tsCol: String, valueCol: String,
                          gapSeconds: Long,
                          tsUnit: String = "nanos"): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val toNanos = Map("nanos" -> 1L, "micros" -> 1000L,
      "millis" -> 1000000L, "seconds" -> 1000000000L)
    require(toNanos.contains(tsUnit),
      s"tsUnit must be one of ${toNanos.keys.mkString("|")}, got '$tsUnit'")
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val isTimestamp = events0.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    val scaled = if (isTimestamp) events0
      else events0.withColumn(tsCol,
        col(tsCol).cast("long") * toNanos(tsUnit))
    val events = scaled.withColumn(tsCol,
      TimeCols.epochNanos(scaled, tsCol))
    events
      // floorDivSql, not bare `div`: pre-1970 nanos must floor to the
      // EARLIER microsecond, like every engine converting ns→us
      .withColumn("_event_time", expr(
        s"timestamp_micros(${TimeCols.floorDivSql(s"`$tsCol`", 1000L)})"))
      .groupBy(col(userCol),
        session_window(col("_event_time"), s"$gapSeconds seconds").as("_sw"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col(userCol),
        (unix_micros(col("_sw.start")) * 1000L).as("session_start"),
        (unix_micros(col("_sw.end")) * 1000L).as("session_end"),
        col("n_events"), col("sum_value"))
  }
}
