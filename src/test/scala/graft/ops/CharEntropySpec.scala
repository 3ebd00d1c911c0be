package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.expressions.CharEntropy.char_entropy

class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Independent scalar reference (map-based, same log formulation). */
  private def entropyRef(s: String): Double = {
    if (s.isEmpty) return 0.0
    val freq = s.groupBy(identity).map { case (c, xs) => c -> xs.length }
    val ln2 = math.log(2.0)
    freq.toSeq.sortBy(_._1).map { case (_, c) =>
      val p = c.toDouble / s.length
      -p * (math.log(p) / ln2)
    }.sum
  }

  private def run(texts: Seq[String]): Seq[Double] =
    texts.toDF("text").select(char_entropy($"text").as("h"))
      .as[Double].collect().toSeq

  test("matches the scalar reference on random strings") {
    val rnd = new scala.util.Random(19)
    val texts = Seq.fill(100)(
      Seq.fill(rnd.nextInt(200) + 1)(
        (rnd.nextInt(64) + 32).toChar).mkString)
    assert(run(texts) == texts.map(entropyRef))
  }

  test("degenerate and exact cases") {
    assert(run(Seq("", "aaaa", "abcdabcd", "ab")) ==
      Seq(0.0, 0.0, 2.0, 1.0))
  }

  test("NULL text is NULL") {
    val r = Seq(Option.empty[String]).toDF("text")
      .select(char_entropy($"text")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("frequency table resets between rows (no cross-row bleed)") {
    // same char sets across consecutive rows would expose a stale
    // table: entropy of "ab" must be identical wherever it appears
    val got = run(Seq("ab", "aabb", "ab", "zzzz", "ab"))
    assert(got(0) == 1.0 && got(2) == 1.0 && got(4) == 1.0)
    assert(got(1) == 1.0 && got(3) == 0.0)
  }

  test("callable from SQL") {
    val h = spark.sql("SELECT char_entropy('abcdabcd') AS h")
      .as[Double].head()
    assert(h == 2.0)
  }
}
