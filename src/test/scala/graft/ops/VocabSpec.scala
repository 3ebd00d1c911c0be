package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class VocabSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "   "),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("topTokens ranks by count desc then token asc, dense ids") {
    val v = Vocab.topTokens(docs, "text", 4)
    assert(v == Seq("the" -> 0L, "sat" -> 1L, "cat" -> 2L, "dog" -> 3L))
  }

  test("encode preserves positions, maps OOV to oovId") {
    val v = Vocab.topTokens(docs, "text", 4)
    val got = Vocab.encode(docs, "text", v)
      .select("doc_id", "token_ids").as[(Long, Seq[Long])]
      .collect().toMap
    assert(got(1L) == Seq(0L, 2L, 1L, -1L, 0L, -1L)) // on/mat OOV
    assert(got(2L) == Seq(0L, 3L, 1L))
    assert(got(3L) == Seq.empty) // whitespace-only → empty sequence
  }

  test("NULL text encodes to NULL, not empty") {
    val v = Seq("x" -> 0L)
    val row = Vocab.encode(docs, "text", v)
      .filter($"doc_id" === 4L).select("token_ids").collect()(0)
    assert(row.isNullAt(0))
  }

  test("deterministic split: fractions respected, rerun-stable") {
    val df = (1L to 10000L).map(i => Tuple1(i)).toDF("id")
    val a = Sampling.assignSplit(df, "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = a.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 9000L) < 300)
    assert(math.abs(counts("val") - 500L) < 120)
    assert(math.abs(counts("test") - 500L) < 120)
    // rerun-stable: same assignment row-for-row
    val b = Sampling.assignSplit(df, "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("split fractions must sum to 1") {
    intercept[IllegalArgumentException](
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
  }
}
