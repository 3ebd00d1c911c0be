package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) construction from a change
  * event stream: collapse consecutive rows with unchanged tracked
  * attributes into versioned validity intervals — the standard
  * warehouse shape `(key, version, attrs…, valid_from, valid_to,
  * is_current)`.
  *
  * Scale shape: everything is window functions over ONE range
  * exchange on the entity key — change detection (`lag`), run
  * numbering (running `sum` of change flags), and interval closing
  * (`lead` of the next run's start) all reuse the same
  * `(partition key, order)` spec, so Catalyst plans a single
  * Exchange + Sort and evaluates the three windows in one pass.
  * Per-entity history lives in one partition — the natural layout,
  * since an entity's versions are meaningless split apart; entity
  * count provides the parallelism at 100 TB, and no state beyond
  * one entity's rows is ever held.
  */
object Scd {

  /** Build SCD2 intervals. `orderCols` must be a deterministic total
    * order within each key (include a unique id as tie-break —
    * nondeterministic order would renumber versions on rerun).
    * A "change" is any tracked attribute differing from the previous
    * event (null-safe: NULL→value and value→NULL both count).
    * `valid_to` is the next version's `valid_from` (half-open
    * intervals, the join-friendly convention); NULL marks the open
    * current version.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
           orderCols: Seq[String], validFromCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty && orderCols.nonEmpty,
      "keyCols, attrCols and orderCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // Null-safe "any attribute changed vs previous event".
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    // First event of each key: lag is NULL on every attr, so the
    // null-safe compare says "changed" only when the attr is non-null;
    // force it — the first event always opens version 1.
    val isFirst = row_number().over(w) === 1
    // ROWS frame, not Spark's default RANGE frame: if orderCols ever
    // tie, RANGE would give peer rows the same cumulative sum and
    // silently merge/renumber runs, diverging from the oracle's
    // ROWS UNBOUNDED PRECEDING semantics.
    val runId = sum(when(isFirst || changed, 1).otherwise(0))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val staged = df.select(
      (keyCols ++ attrCols).map(col) :+ col(validFromCol) :+
        runId.as("_run"): _*)
    val aggs = attrCols.map(a => first(col(a)).as(a)) :+
      min(col(validFromCol)).as("valid_from") :+
      count(lit(1)).as("n_events")
    val runs = staged.groupBy((keyCols :+ "_run").map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val wr = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_run"))
    runs
      .withColumn("version", col("_run"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_run")
      .select((keyCols.map(col) :+ col("version")) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"),
          col("n_events")): _*)
  }

  /** Point-in-time lookup against an SCD2 frame: the version of each
    * key whose `[valid_from, valid_to)` interval contains `asOf`.
    * A plain filter — no join, no window — so it composes as a cheap
    * view over the versioned table. */
  def asOf(scd: DataFrame, asOfExpr: Column): DataFrame =
    scd.filter(col("valid_from") <= asOfExpr &&
      (col("valid_to").isNull || col("valid_to") > asOfExpr))

  /** SCD type-1 / latest-snapshot: the most recent event per key by
    * `orderCols` (which must totally order events within a key —
    * include a unique tie-break). The CDC-compaction shape: a change
    * stream collapses to current state. Keeps the input schema.
    *
    * Scale shape: one exchange on the key + per-partition sort, and
    * the `row_number() = 1` predicate plans as `WindowGroupLimit` —
    * Spark prunes to each group's top row map-side BEFORE the
    * shuffle, so at 100 TB the exchange carries ~one row per key,
    * not the full history. */
  def latest(df: DataFrame, keyCols: Seq[String],
             orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "keyCols and orderCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
