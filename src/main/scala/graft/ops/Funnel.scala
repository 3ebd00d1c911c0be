package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each key, how deep into the step
  * sequence did it get, matching each step to its EARLIEST event
  * strictly after the previous step's match (the standard greedy
  * funnel — earliest-match maximizes reachable depth, so the result
  * is unambiguous). Emits the matched epoch-nano timestamps per
  * step, null from the first uncompleted step on.
  *
  * Determinism: pure integer min/compare arithmetic on epoch nanos —
  * no floats anywhere.
  *
  * Scale shape: one keyed aggregation PER STEP (each a partial-agg
  * shuffle on the key, joined back to the previous step's matches);
  * passes scale with the number of steps, never with data volume
  * beyond the scans. No collect, no window over raw events. */
object Funnel {

  /** `(keyCol, funnel_depth, t_<step1>, t_<step2>, ...)`.
    * `maxSpanSeconds`: when set, steps beyond the first must also
    * land within that span of the FIRST step's match (the
    * conversion-window form; the window anchors at the earliest
    * first-step event — the standard product-analytics contract). */
  def depth(df: DataFrame, keyCol: String, tsCol: String,
            typeCol: String, steps: Seq[String],
            maxSpanSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"duplicate steps: ${steps.diff(steps.distinct).mkString(", ")}")
    val ev = df.select(col(keyCol),
      TimeCols.epochNanos(df, tsCol).as("_t"), col(typeCol).as("_ty"))
    val keys = ev.select(col(keyCol)).distinct()
    val withTimes = steps.zipWithIndex.foldLeft(keys) {
      case (acc, (step, i)) =>
        val tc = s"t_$step"
        val prevT: org.apache.spark.sql.Column =
          if (i == 0) lit(Long.MinValue)
          else col(s"t_${steps(i - 1)}")
        val spanOk: org.apache.spark.sql.Column = maxSpanSeconds match {
          case Some(span) if i > 0 =>
            col("_t") <= col(s"_anchor") + lit(span * 1000000000L)
          case _ => lit(true)
        }
        val anchored =
          if (i == 0) acc.select(col(keyCol), prevT.as("_prev"),
            lit(0L).as("_anchor"))
          else acc.select(col(keyCol), prevT.as("_prev"),
            col(s"t_${steps.head}").as("_anchor"))
        // SHUFFLE_HASH pin on the raw event side (round-13 audit):
        // ev is ALWAYS corpus-scale (self-op on the event stream) and
        // its subtree is scan→project with no exchange below, so a
        // lying estimate statically broadcasts the whole event table
        // once PER STEP with nothing for AQE to measure first. Skinny
        // (key, t, type) rows → hash build; the exchange the pin
        // forces on ev is the same keyed exchange a non-broadcast
        // join needs anyway, and AQE may still broadcast `anchored`
        // (genuinely key-sized) from measured sizes.
        acc.join(
          anchored
            .join(ev.hint("SHUFFLE_HASH"), Seq(keyCol))
            .filter(col("_ty") === step && col("_t") > col("_prev") &&
              spanOk)
            .groupBy(col(keyCol)).agg(min(col("_t")).as(tc)),
          Seq(keyCol), "left")
    }
    // fold FORWARD so the deepest step's check is built last (and
    // therefore evaluated first — a completed step always implies the
    // shallower ones are set too)
    val depthCol = steps.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (step, i)) =>
        when(col(s"t_$step").isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    withTimes.select(
      (col(keyCol) +: depthCol.as("funnel_depth") +:
        steps.map(s => col(s"t_$s"))): _*)
  }
}
