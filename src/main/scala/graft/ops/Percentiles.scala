package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles without per-group array collection.
  *
  * Spark's `percentile()` is a TypedImperativeAggregate that buffers
  * EVERY value of the group in memory — fine at 60k rows, an OOM at
  * 100 TB. This construction is all sort + window + one aggregation:
  *
  *   rn  = row_number over (group, value-order)
  *   n   = count over group
  *   h_p = (n-1)·p;  lo = ⌊h⌋+1;  frac = h-⌊h⌋
  *   q_p = v[lo] + frac·(v[lo+1] − v[lo])     (linear interpolation,
  *                                             same as SQL quantile_cont)
  *
  * Cost: one range shuffle for the window sort, then a partial+final
  * agg that keeps only the two boundary rows per (group, percentile).
  * Memory per task is O(1).
  */
object Percentiles {

  /** Returns `keys :+ p_<label> ...` with one column per requested
    * percentile. `ps` are (label, fraction) pairs.
    *
    * NULL values are ignored — the same semantics as SQL
    * `percentile`/`quantile_cont` (ranking them would shift every
    * percentile; `_n` must count VALUES, not rows). Groups whose
    * values are all NULL still appear, with NULL percentiles, via the
    * key-restoring left join. */
  def exactInterpolated(df: DataFrame, keys: Seq[String], valueCol: String,
                        ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val cnt = Window.partitionBy(keys.map(col): _*)
    // the unbounded count window rides the SAME exchange as the
    // row_number sort; an agg + broadcast-join alternative measured
    // slightly slower (extra stage barrier) at sf0.1
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cnt))

    val aggs = ps.flatMap { case (label, p) =>
      val h = (col("_n") - 1) * lit(p)
      val lo = floor(h) + 1
      val frac = h - floor(h)
      Seq(
        max(when(col("_rn") === lo, col(valueCol))).as(s"_lo_$label"),
        max(when(col("_rn") === lo + 1, col(valueCol))).as(s"_hi_$label"),
        max(when(col("_rn") === lo, frac)).as(s"_frac_$label"))
    }
    val out = ranked.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val computed = ps.foldLeft(out) { case (acc, (label, _)) =>
      acc.withColumn(label,
        col(s"_lo_$label") + col(s"_frac_$label") *
          (coalesce(col(s"_hi_$label"), col(s"_lo_$label")) - col(s"_lo_$label")))
        .drop(s"_lo_$label", s"_hi_$label", s"_frac_$label")
    }
    // groups whose every value was NULL dropped out of `ranked`;
    // SQL percentile still emits them (with NULL) — restore via the
    // original key set (tiny agg + broadcast-able join). NULL-SAFE
    // equality: a NULL key is a legal GROUP BY group in both Spark
    // and SQL, and `=` would orphan it (NULL percentiles for a group
    // that has values).
    // (computed's keys are renamed first — both sides descend from
    // `df`, and same-name columns across a self-join lineage trip
    // Spark's ambiguity heuristics)
    val keyDf = df.select(keys.map(col): _*).distinct()
    val renamed = computed.select(
      keys.map(k => col(k).as(s"_ck_$k")) ++
        ps.map { case (label, _) => col(label) }: _*)
    val joinCond = keys.map(k => col(k) <=> col(s"_ck_$k")).reduce(_ && _)
    keyDf.join(renamed, joinCond, "left")
      .select(keys.map(col) ++ ps.map { case (label, _) => col(label) }: _*)
  }
}
