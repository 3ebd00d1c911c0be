package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def run(text: String, size: Int, stride: Int, minTokens: Int = 1) =
    Chunking.slidingWindow(
        Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size, stride, minTokens)
      .select("chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq.sortBy(_._1)

  test("windows overlap by size - stride and the tail is short") {
    val got = run("a b c d e f g", size = 4, stride = 2)
    assert(got == Seq(
      (0L, 4L, "a b c d"),
      (1L, 4L, "c d e f"),
      (2L, 3L, "e f g"),
      (3L, 1L, "g")))
  }

  test("stride == size gives non-overlapping partition of the tokens") {
    val got = run("a b c d e", size = 2, stride = 2)
    assert(got == Seq((0L, 2L, "a b"), (1L, 2L, "c d"), (2L, 1L, "e")))
    assert(got.map(_._2).sum == 5)
  }

  test("min_tokens drops trailing fragments") {
    val got = run("a b c d e f g", size = 4, stride = 2, minTokens = 2)
    assert(got.map(_._1) == Seq(0L, 1L, 2L))
  }

  test("doc shorter than one window is a single short chunk") {
    assert(run("hi there", size = 16, stride = 8) == Seq((0L, 2L, "hi there")))
  }

  test("blank, whitespace-only and NULL text produce no chunks") {
    val df = Seq((1L, ""), (2L, "   \t "), (3L, null)).toDF("doc_id", "text")
    assert(Chunking.slidingWindow(df, "doc_id", "text", 8, 4).count() == 0L)
  }

  test("multi-whitespace runs tokenize like single spaces") {
    assert(run("  a\t\tb \n c  ", size = 2, stride = 2) ==
      Seq((0L, 2L, "a b"), (1L, 1L, "c")))
  }

  test("invalid size/stride rejected") {
    intercept[IllegalArgumentException](run("a", 0, 1))
    intercept[IllegalArgumentException](run("a", 4, 5))
    intercept[IllegalArgumentException](run("a", 4, 0))
  }
}
