package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** BM25 retrieval: hand-computed scores on a tiny corpus, rank
  * ordering, tokenization parity with the corpus normalizer. */
class Bm25Spec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "cat dog cat"),     // dl=3
    (2L, "dog fish"),        // dl=2
    (3L, "cat cat cat cat"), // dl=4
    (4L, "bird")             // dl=1
  ).toDF("doc_id", "text")

  test("topK matches a hand-computed BM25 score") {
    // query 'cat': df=2, N=4, avgdl=10/4=2.5
    // idf = ln(1 + (4-2+0.5)/(2+0.5)) = ln(2)
    // doc1: tf=2, dl=3 -> ln2 * 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/2.5))
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q1", "cat")), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._3).toSet == Set(1L, 3L)) // only docs with 'cat'
    val d1 = out.find(_._3 == 1L).get._4
    val expected = math.log(2.0) * (2 * 2.2) /
      (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / 2.5))
    assert(math.abs(d1 - expected) < 1e-12)
    // doc3 (tf=4 but longer) still outranks doc1 here
    assert(out.find(_._2 == 1L).get._3 == 3L)
  }

  test("multi-term queries sum per-term scores; rank is dense per query") {
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q1", "cat dog"), ("q2", "fish")), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // q1 top-2 out of docs {1,2,3}; doc1 matches both terms
    assert(out.count(_._1 == "q1") == 2)
    assert(out.filter(_._1 == "q1").map(_._2).sorted.toSeq == Seq(1L, 2L))
    // q2 only doc2 matches
    assert(out.filter(_._1 == "q2").map(_._3).toSeq == Seq(2L))
  }

  test("query text is normalized like the corpus (punct, case)") {
    val a = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "CAT, dog!")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    val b = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat dog")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(a == b)
  }

  test("duplicate terms in the query count once") {
    val a = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat cat cat")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    val b = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(a == b)
  }

  test("parameter limits: k1=0 scores pure idf presence; b=0 drops length norm") {
    // k1 = 0: tf*(k1+1)/(tf + 0) = 1 regardless of tf -> score is
    // Σ idf over matched terms; docs 1 and 3 must tie exactly
    val k1zero = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat")), k = 10, k1 = 0.0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(k1zero(1L) == k1zero(3L))
    assert(math.abs(k1zero(1L) - math.log(2.0)) < 1e-12)
    // b = 0: no length normalization -> only tf decides within a
    // term; doc3 (tf=4) strictly above doc1 (tf=2), both above their
    // b=0.75 counterparts' ordering sensitivity to dl
    val bzero = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat")), k = 10, b = 0.0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val expected1 = math.log(2.0) * (2 * 2.2) / (2 + 1.2)
    assert(math.abs(bzero(1L) - expected1) < 1e-12)
    assert(bzero(3L) > bzero(1L))
    // invalid parameters fail loudly
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", Seq(("q", "cat")), k = 10,
        b = 1.5)
    }
  }

  test("no-match queries emit no rows; k caps output") {
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "zebra")), k = 3)
    assert(out.count() == 0)
    val capped = Bm25.topK(corpus, "doc_id", "text",
        Seq(("q", "cat")), k = 1).collect()
    assert(capped.length == 1 && capped(0).getLong(1) == 1L)
  }
}
