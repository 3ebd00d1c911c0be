package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Winnowing fingerprints: the shared-substring guarantee, identical
  * docs collide, density bound, short-text edge. */
class WinnowSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("shared substrings >= w+k-1 chars yield shared fingerprints") {
    // both docs embed the same 12-char run "quick brown" inside
    // otherwise different text (k=5, w=4 -> guarantee at >= 8 chars)
    val docs = Seq(
      (1L, "the quick brown fox leaps over it"),
      (2L, "a quick brown bear sits"),
      (3L, "completely unrelated words entirely")
    ).toDF("doc_id", "text")
    val fp = Text.winnow(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((fp(1L) & fp(2L)).nonEmpty, "no shared fingerprint for shared run")
    assert((fp(1L) & fp(3L)).isEmpty ||
      (fp(1L) & fp(3L)).size < (fp(1L) & fp(2L)).size)
  }

  test("identical docs produce identical fingerprint sets; density bounded") {
    val docs = Seq((1L, "some repeated corpus sentence here"),
      (2L, "some repeated corpus sentence here")).toDF("doc_id", "text")
    val rows = Text.winnow(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(t => (t._2, t._3)).toSet }
    assert(byDoc(1L) == byDoc(2L))
    // at most one selection per window start
    val t = "some repeated corpus sentence here"
    val nWindows = (t.length - 5 + 1) - 3
    assert(byDoc(1L).size <= nWindows)
  }

  test("texts shorter than k emit nothing; bad params rejected") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    assert(Text.winnow(docs, "doc_id", "text", k = 5, w = 4).count() == 0)
    assert(intercept[IllegalArgumentException] {
      Text.winnow(docs, "doc_id", "text", k = 1, w = 4)
    }.getMessage.contains("k >= 2"))
  }
}
