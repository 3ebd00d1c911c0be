package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-contract validation — the expectations gate (Deequ /
  * Great-Expectations shape) a pipeline runs before promoting a
  * table: each rule is an SQL predicate rows must satisfy; the
  * report counts violations per rule in ONE pass. Uniqueness rules
  * (no key may repeat) get their own aggregation path since they are
  * a property of groups, not rows.
  *
  * Scale shape: all row rules compile into a single
  * conditional-count aggregation over one scan (adding a rule adds a
  * counter, not a pass); each uniqueness rule is one groupBy on its
  * key counting groups with >1 row — the same partial-agg shuffle a
  * `distinct` would pay. No collect beyond the #rules-sized report.
  */
object Expectations {

  /** `rowRules`: (name, SQL boolean expr) — a row VIOLATES when the
    * predicate is false OR null (null-hostile by design: an
    * expectation that cannot be evaluated is not satisfied).
    * `uniqueRules`: (name, key columns) — violations = rows beyond
    * the first in any duplicated key group. Returns
    * `(rule, n_violations, pass)` ordered by rule. */
  def check(df: DataFrame, rowRules: Seq[(String, String)],
            uniqueRules: Seq[(String, Seq[String])] = Seq.empty): DataFrame = {
    require(rowRules.nonEmpty || uniqueRules.nonEmpty,
      "at least one expectation rule is required")
    val names = rowRules.map(_._1) ++ uniqueRules.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate rule names: ${names.diff(names.distinct).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._

    val rowReport: Option[DataFrame] = if (rowRules.isEmpty) None else {
      val counters = rowRules.map { case (name, pred) =>
        sum(when(coalesce(expr(pred), lit(false)), 0L).otherwise(1L))
          .as(name)
      }
      val one = df.agg(counters.head, counters.tail: _*)
      // unpivot the 1-row aggregate into (rule, n_violations)
      Some(one.select(explode(map(
        rowRules.flatMap { case (n, _) => Seq(lit(n), col(n)) }: _*))
        .as(Seq("rule", "n_violations"))))
    }
    val uniqReports = uniqueRules.map { case (name, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
        .agg(coalesce(sum(when(col("_n") > 1, col("_n") - 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    }
    val all = (rowReport.toSeq ++ uniqReports).reduce(_.unionAll(_))
    all.withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }
}
