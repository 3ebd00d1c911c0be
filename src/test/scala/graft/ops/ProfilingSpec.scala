package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None),
    (None, Some("a")), (Some(9L), Some("c"))
  ).toDF("id", "tag")

  test("exact stats: rows, nulls, distinct, min/max per column") {
    val got = Profiling.columnStats(df, Seq("id", "tag"), exact = true)
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("id", 5L, 1L, 3L, "1", "9"),
      ("tag", 5L, 1L, 3L, "a", "c")))
  }

  test("approx (HLL) distinct counts are near-exact on small data") {
    val big = (1L to 5000L).map(i => (i, s"t${i % 37}")).toDF("id", "tag")
    val got = Profiling.columnStats(big, Seq("id", "tag"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect()
    val ndv = got.map(r => r._1 -> r._4).toMap
    // default rsd is 0.05 (one sigma) — allow ~3 sigma
    assert(math.abs(ndv("id") - 5000L) < 5000 * 0.15)
    assert(math.abs(ndv("tag") - 37L) <= 2)
    assert(got.forall(r => r._2 == 5000L && r._3 == 0L))
  }

  test("unknown column rejected") {
    intercept[IllegalArgumentException](
      Profiling.columnStats(df, Seq("nope")))
  }

  test("hostile column names (spaces, dots, quotes) profile safely") {
    val odd = df
      .withColumnRenamed("id", "weird col.name")
      .withColumnRenamed("tag", "it's quoted")
    val got = Profiling.columnStats(odd,
        Seq("weird col.name", "it's quoted"), exact = true)
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("it's quoted", 5L, 1L, 3L, "a", "c"),
      ("weird col.name", 5L, 1L, 3L, "1", "9")))
  }
}
