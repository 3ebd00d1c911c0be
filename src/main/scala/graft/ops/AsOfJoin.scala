package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `right.time <= left.time` on matching keys (the time-series join
  * Spark lacks; semantics match DuckDB/kdb ASOF JOIN, inclusive).
  *
  * Implemented compositionally (preference tier a — no custom
  * physical operator needed): tag and union both sides, then one
  * window pass per key ordered by (time, side) carries the latest
  * right payload forward into each left row. Exactly ONE shuffle of
  * (keys) — the same cost as a co-partitioned merge join — versus the
  * naive inequality-join which is O(left × right) per key. State per
  * window frame is one struct (`last` with ignoreNulls), so skewed
  * keys degrade to sort cost, not memory.
  *
  * Ties: right rows sort before left rows at equal time (inclusive
  * match); among multiple right rows at the SAME (key, time) the one
  * latest in `tieBreak` order wins — pass a unique column to make the
  * result deterministic.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           tieBreak: Option[String] = None,
           joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOf supports inner/left, got $joinType")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val payloadCols = rightCols.filterNot(keys.contains)

    // type-aware: native timestamp columns work directly (epoch-nanos
    // via TimeCols), integral columns pass through as before
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        TimeCols.epochNanos(left, leftTime).as("_t"),
        lit(1).as("_side"),
        lit(null).cast(right.select(struct(payloadCols.map(col): _*).as("x"))
          .schema("x").dataType).as("_r"),
        struct(leftCols.map(col): _*).as("_l")): _*)

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        TimeCols.epochNanos(right, rightTime).as("_t"),
        lit(0).as("_side"),
        struct(payloadCols.map(col): _*).as("_r"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*).as("x"))
          .schema("x").dataType).as("_l")): _*)

    val ordered = tieBreak match {
      case Some(tb) =>
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("_t").asc, col("_side").asc,
            coalesce(col(s"_r.$tb"), lit(Long.MinValue)).asc)
      case None =>
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("_t").asc, col("_side").asc)
    }
    val w = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val base = if (joinType == "inner") matched.filter(col("_match").isNotNull)
      else matched

    base.select(
      leftCols.map(n => col(s"_l.$n").as(n)) ++
        payloadCols.map(n => col(s"_match.$n").as(n)): _*)
  }
}
