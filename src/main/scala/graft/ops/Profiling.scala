package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling: per-column statistics in ONE aggregation pass —
  * the ANALYZE step a pipeline runs before and after a cleaning stage
  * to see what it did (row deltas, null creep, cardinality collapse,
  * range drift) without a notebook.
  *
  * Scale shape: a single global aggregate — partial aggregation on
  * every partition, one final reduce of O(cols) state. With
  * `exact = false` (the default, and the 100 TB path) distinct counts
  * are HyperLogLog (`approx_count_distinct`, fixed sketch size per
  * column, no extra shuffle). `exact = true` switches to
  * `count_distinct`, which Catalyst plans via an Expand (rows ×
  * profiled columns) — the right trade only where the oracle needs
  * exactness or the frame is small.
  *
  * Output is long-form — (col_name, n_rows, n_nulls, n_distinct,
  * min_value, max_value), one row per profiled column, min/max cast
  * to string for a uniform schema — so downstream gates can join on
  * col_name rather than parse a wide one-row frame.
  */
object Profiling {

  def columnStats(df: DataFrame, cols: Seq[String],
                  exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile columns must be non-empty")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    def ndv(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c)
    // helper aggregates are named by POSITION, and the profiled name
    // enters the stack() string only as an escaped literal — a column
    // named `weird col.name'` profiles fine, because no user-supplied
    // text is ever parsed as an identifier
    // backtick-quote for resolution too: bare col("a.b") would parse
    // the dot as struct-field access
    def qcol(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val aggs: Seq[Column] = count(lit(1)).as("_total") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(count(qcol(c)).as(s"_cnt_$i"), ndv(qcol(c)).as(s"_ndv_$i"),
          min(qcol(c)).cast("string").as(s"_min_$i"),
          max(qcol(c)).cast("string").as(s"_max_$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex
      .map { case (c, i) =>
        val lit = c.replace("\\", "\\\\").replace("'", "\\'")
        s"'$lit', _cnt_$i, _ndv_$i, _min_$i, _max_$i"
      }
      .mkString(", ")
    one.select(col("_total"),
        expr(s"stack(${cols.size}, $stacked) AS " +
          "(col_name, _non_null, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("_total").as("n_rows"),
        (col("_total") - col("_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
