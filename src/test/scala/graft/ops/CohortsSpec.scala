package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Cohort retention: hand-computed triangle, distinct-per-period,
  * period-boundary edges. Timestamps are epoch-nano longs. */
class CohortsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def ns(s: Long) = s * 1000000000L

  test("retention triangle counts distinct actives per offset") {
    // period = 100 s. a: first in p0, active p0/p1/p3 (two events in
    // p1 count once). b: first p0, active p0 only. c: first p1,
    // active p1/p2.
    val ev = Seq(
      ("a", ns(10)), ("a", ns(110)), ("a", ns(150)), ("a", ns(390)),
      ("b", ns(99)),
      ("c", ns(100)), ("c", ns(250))
    ).toDF("user_id", "ts")
    val out = Cohorts.retention(ev, "user_id", "ts", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (0L, 0L) -> 2L,  // a + b in their cohort period
      (0L, 1L) -> 1L,  // a
      (0L, 3L) -> 1L,  // a
      (1L, 0L) -> 1L,  // c
      (1L, 1L) -> 1L)) // c
    val err = intercept[IllegalArgumentException] {
      Cohorts.retention(ev, "user_id", "ts", 0L)
    }
    assert(err.getMessage.contains("positive"))
  }

  test("pre-1970 events floor into the EARLIER period (no trunc-up)") {
    // -10 s is period -1 under floor division (trunc would say 0 and
    // merge it with the 10 s event's cohort); -5 ns is second -1,
    // also period -1. Offsets stay non-negative from the true first.
    val ev = Seq(
      ("a", ns(-10)), ("a", ns(10)),
      ("b", -5L)
    ).toDF("user_id", "ts")
    val out = Cohorts.retention(ev, "user_id", "ts", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (-1L, 0L) -> 2L,  // a's first event AND b land in period -1
      (-1L, 1L) -> 1L)) // a active again in period 0 = offset 1
  }
}
