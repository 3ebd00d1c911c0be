package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** AQE's runtime skew-join split — the engine's first line of defense
  * for hot keys at 100 TB (explicit salting in [[Skew.saltedJoin]] is
  * the fallback for cases AQE can't reach, e.g. streaming joins).
  * This spec builds a genuinely skewed join with the split thresholds
  * scaled down to fixture size and asserts the executed plan actually
  * marked the sort-merge join as skew-handled — the claim is about
  * what the engine DOES at runtime, not config. All knobs are
  * runtime session confs, set on the shared session and restored. */
class SkewAqeSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark

  private val knobs = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10KB",
    "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val saved = knobs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    knobs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 100k rows with INCOMPRESSIBLE payloads (the
      // map-output stats AQE reads are post-compression; a constant
      // pad compresses to nothing and hides the skew); keys 1..99
      // carry ~10 rows each
      val fat = md5(col("id").cast("string"))
      val skewed = spark.range(100000).select(lit(0L).as("k"),
          col("id").as("v"), fat.as("pad"))
        .union(spark.range(1000).select((col("id") % 99 + 1).as("k"),
          col("id").as("v"), fat.as("pad")))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"))

      val joined = skewed.join(dim, Seq("k"))
      // execute THIS queryExecution (count() would execute a separate
      // aggregate plan, leaving joined's adaptive plan un-finalized)
      assert(joined.collect().length == 101000)

      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an adaptive plan root"))
      // query stages wrap their subtree in `plan`, not `children`, so a
      // plain collectFirst never descends past the ResultQueryStage root
      def findSmj(p: SparkPlan): Option[SortMergeJoinExec] = p match {
        case j: SortMergeJoinExec => Some(j)
        case q: QueryStageExec   => findSmj(q.plan)
        case other => other.children.view.flatMap(findSmj).headOption
      }
      val smj = findSmj(adaptive.executedPlan).getOrElse(fail(
        s"expected a sort-merge join in the final plan:\n${adaptive.executedPlan}"))
      assert(smj.isSkewJoin,
        s"AQE did not mark the join as skew-handled:\n${adaptive.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
