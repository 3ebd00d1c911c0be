package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-portable decimal rounding, shared by operators whose
  * outputs are hash-compared against a DuckDB replay. */
object Rounding {

  /** `floor(x·10^p + 0.5 + 1e-6) / 10^p` — round-half-up with a 1e-6
    * nudge. The nudge absorbs cross-engine last-ulp noise at the
    * midpoint: a value that lands EXACTLY on `.xxxx5` in one engine
    * can compute as `.xxxx4999…` in the other, and plain half-up
    * would round them apart; with the nudge both engines round such
    * values up consistently. The oracle SQL's `r(x, p)` macro expands
    * to the IDENTICAL formula (SparkEntry.expandR) — any change here
    * must change that expansion in lockstep or every rounded oracle
    * comparison breaks. */
  def portable(c: Column, p: Int): Column = {
    val f = math.pow(10, p)
    floor(c * f + 0.5 + 1e-6) / f
  }
}
