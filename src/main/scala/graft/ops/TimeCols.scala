package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Type-aware epoch normalization for time columns.
  *
  * The time-series operators (as-of join, sessionization, event
  * windows) do arithmetic on epoch-long times. Real tables carry
  * either shape — integral epoch columns (any unit, the caller owns
  * the scale) or native TIMESTAMP/TIMESTAMP_NTZ columns — and the
  * events fixture itself has shipped both across rounds. These
  * helpers dispatch on the actual column type so both work: integral
  * columns pass through untouched (no unit assumption), timestamp
  * columns convert via `unix_micros` under the UTC session timezone
  * every graft session pins (value-preserving for NTZ, and identical
  * to DuckDB's `epoch_ns`/`epoch_us` on the same data). */
object TimeCols {

  /** The column as epoch NANOS when it is a timestamp; integral
    * columns cast to long AS-IS (caller-owned unit). */
  def epochNanos(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast("timestamp")) * 1000L
      case _ => col(c).cast("long")
    }

  /** Exact 64-bit FLOOR division as a SQL fragment (DuckDB's `//`):
    * Spark's `div` truncates toward zero, so pre-1970 (negative
    * epoch) values would snap UP to the next grid slot and diverge
    * from every floor-dividing engine. `div` adjusted down by one
    * when the remainder is negative restores floor semantics; stays
    * in pure long arithmetic (epoch nanos exceed double's 2^53 exact
    * range, so float `floor(a / b)` is not an option). `b` must be a
    * positive literal — every grid step is. */
  def floorDivSql(a: String, b: Long): String = {
    require(b > 0, s"floorDivSql needs a positive divisor, got $b")
    s"(($a div $b) - (CASE WHEN ($a % $b) < 0 THEN 1 ELSE 0 END))"
  }
}
