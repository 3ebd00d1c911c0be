package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: group keys by the PERIOD of their first event
  * (the cohort), then count how many of each cohort are active in
  * each subsequent period offset — the standard retention triangle.
  * Pure integer epoch arithmetic (period = epoch seconds div
  * periodSeconds), so the replay is exact.
  *
  * Scale shape: one keyed min-aggregation (cohort assignment), one
  * (key, period) distinct, one (cohort, offset) count — three
  * partial-agg shuffles, no windows over raw events, no collect. */
object Cohorts {

  /** `(cohort_period, period_offset, n_active)`: for each cohort
    * (first-event period, a `periodSeconds`-grid index) and offset
    * ≥ 0, the number of distinct keys active in that period.
    * Offset 0 is the cohort size by construction. */
  def retention(df: DataFrame, keyCol: String, tsCol: String,
                periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0,
      s"periodSeconds must be positive, got $periodSeconds")
    val ev = df
      .select(col(keyCol), TimeCols.epochNanos(df, tsCol).as("_ns"))
      // floor division (see TimeCols.floorDivSql): pre-1970 events
      // must land in the EARLIER period, matching DuckDB's `//`
      .withColumn("_p", expr(TimeCols.floorDivSql(
        TimeCols.floorDivSql("_ns", 1000000000L), periodSeconds)))
      .select(col(keyCol), col("_p"))
    val firstP = ev.groupBy(col(keyCol)).agg(min(col("_p")).as("_cohort"))
    val active = ev.distinct()
    active.join(firstP, Seq(keyCol))
      .groupBy(col("_cohort").as("cohort_period"),
        (col("_p") - col("_cohort")).as("period_offset"))
      .agg(count_distinct(col(keyCol)).as("n_active"))
      .select(col("cohort_period"), col("period_offset"), col("n_active"))
  }
}
