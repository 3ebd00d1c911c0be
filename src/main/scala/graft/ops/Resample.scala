package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-grid resampling with forward fill — the missing
  * alignment step between event streams and anything that consumes
  * fixed-cadence series (feature tables, joins across streams with
  * different cadences, windowed trainers). For every key, events
  * snap to `stepSeconds` slots; the key's own [min, max] slot range
  * becomes a dense grid; empty slots carry the last observed value
  * forward.
  *
  * Determinism contract (hash-oracle-able): each slot's
  * representative is the LATEST event in the slot, exact second ties
  * broken by maximum value — a total order both engines replay; the
  * carried values are untouched doubles (no arithmetic), so the
  * output matches bit-for-bit.
  *
  * Scale shape: one shuffle on the key (the per-(key, slot)
  * representative window, the bounds aggregate and the forward-fill
  * window all share it); the grid explode is bounded by
  * span/stepSeconds rows per key — a documented caller choice, the
  * same contract as any resample (a key spanning years at 1 s cadence
  * is a misconfiguration, not an engine hazard). No driver state.
  */
object Resample {

  /** Returns `(keyCol, slot_start, value, n_obs)`: one row per key
    * per `stepSeconds` slot from the key's first observed slot to its
    * last, `value` forward-filled from the slot representative
    * (latest ts, ties → max value), `n_obs` = events in the slot
    * (0 for gap rows). `tsCol` may be a native timestamp or an epoch
    * long; integral columns are read as NANOS here (this op derives
    * wall-clock slots, so the unit must be pinned — same contract as
    * [[Sessionize.nativeSessionWindow]]'s default). */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    // floorDivSql (not `/`, not bare `div`): Column./ on longs is
    // DOUBLE division and epoch nanos (~1.7e18) sit beyond double's
    // 2^53 integer range, while `div` truncates toward zero and would
    // snap pre-1970 (negative epoch) events UP a slot — the grid must
    // floor-divide in exact 64-bit, like the DuckDB oracle's `//`
    val snapped = df
      .select(col(keyCol), TimeCols.epochNanos(df, tsCol).as("_ns"),
        col(valueCol).as("_v"))
      .withColumn("_sec", expr(TimeCols.floorDivSql("_ns", 1000000000L)))
      .withColumn("slot",
        expr(s"${TimeCols.floorDivSql("_sec", stepSeconds)} * $stepSeconds"))
      .select(col(keyCol), col("slot"), col("_sec"), col("_v"))

    val repW = Window.partitionBy(col(keyCol), col("slot"))
      .orderBy(col("_sec").desc, col("_v").desc)
    val cntW = Window.partitionBy(col(keyCol), col("slot"))
    val obs = snapped
      .withColumn("_rn", row_number().over(repW))
      .withColumn("n_obs", count(lit(1)).over(cntW))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("slot"), col("_v").as("_v_obs"),
        col("n_obs"))

    val grid = snapped.groupBy(col(keyCol))
      .agg(min(col("slot")).as("_lo"), max(col("slot")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"),
          lit(stepSeconds))).as("slot"))

    val ffW = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot").as("slot_start"),
        last(col("_v_obs"), ignoreNulls = true).over(ffW).as("value"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }
}
