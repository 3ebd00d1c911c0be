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

  test("winnowCandidatePairs finds spliced passages, caps boilerplate") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"intro words here $shared closing remark"),
      (2L, s"different opening $shared and another tail"),
      (3L, "nothing in common with anything at all today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidatePairs(docs, "doc_id", "text",
        minShared = 2, maxFpFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.contains((1L, 2L)), s"spliced pair missed: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // a fingerprint present in EVERY doc is boilerplate: with the cap
    // at 2 and a 3-doc corpus sharing one passage, pairs built only
    // from that passage vanish
    val all3 = Seq((1L, shared), (2L, shared), (3L, shared))
      .toDF("doc_id", "text")
    assert(Dedup.winnowCandidatePairs(all3, "doc_id", "text",
      minShared = 1, maxFpFreq = 2).count() == 0)
  }

  test("texts shorter than k emit nothing; bad params rejected") {
    val docs = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    assert(Text.winnow(docs, "doc_id", "text", k = 5, w = 4).count() == 0)
    assert(intercept[IllegalArgumentException] {
      Text.winnow(docs, "doc_id", "text", k = 1, w = 4)
    }.getMessage.contains("k >= 2"))
  }

  test("kernel matches the SQL spelling per (pos, fp), incl. multibyte " +
      "code points") {
    import org.apache.spark.sql.functions._
    // multibyte text exercises the kernel's UTF-8 code-point slicing
    // (the SQL spelling's substring is code-point based); includes a
    // 4-byte supplementary character
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "日本語のテキストをここに書いておく テスト用の文"),
      (3L, "mixed ascii と 日本語 and a 😀 emoji run here"),
      (4L, "exact seven"), // boundary: a handful of full windows
      (5L, "aaaaaaaaaaaaaaa") // all-equal hashes: rightmost-tie path
    ).toDF("doc_id", "text")
    val kernel = Text.winnow(docs, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // independent SQL replay of the definition (the shape the DuckDB
    // oracle uses), on the same normalized text
    val t = docs.select(col("doc_id"),
      graft.ops.Text.normalize(col("text")).as("_t"))
      .filter(length(col("_t")) >= 5)
    val grams = t.select(col("doc_id"),
        explode(sequence(lit(1), length(col("_t")) - 4)).as("pos"),
        col("_t"))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(expr("substring(_t, pos, 5)")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = grams.flatMap { case (d, xs) =>
      val h = xs.sortBy(_._2).map(_._3)
      val sel = scala.collection.mutable.Set[Int]()
      for (ws <- 0 to h.length - 4) {
        val win = h.slice(ws, ws + 4)
        val m = win.min
        sel += ws + win.lastIndexOf(m)
      }
      sel.map(p => (d, p + 1, h(p)))
    }.toSet
    assert(kernel == expected,
      s"kernel vs SQL replay diverge: only-kernel=${kernel -- expected} " +
        s"only-sql=${expected -- kernel}")
  }
}
