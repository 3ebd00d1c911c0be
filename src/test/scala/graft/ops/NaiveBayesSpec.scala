package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Multinomial NB: hand-computed posteriors on a tiny corpus,
  * all-OOV prior fallback, deterministic tie-break, feature odds. */
class NaiveBayesSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // V = {cat, dog, fish} = 3; N_a = 3 tokens, N_b = 2 tokens
  private def train = Seq(
    (1L, "a", "cat cat dog"),
    (2L, "b", "dog fish")
  ).toDF("doc_id", "label", "text")

  test("posterior matches the hand-computed add-one-smoothed score") {
    val test = Seq((10L, "cat cat"), (11L, "fish fish dog"))
      .toDF("doc_id", "text")
    val out = NaiveBayes
      .trainPredict(train, test, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // doc 10 | a: ln(1/2) + 2*ln((2+1)/(3+3)) = 3*ln(0.5) = -2.0794
    //        | b: ln(1/2) + 2*ln((0+1)/(2+3)) = -3.9120  -> pred a
    assert(out(10L)._1 == "a")
    assert(math.abs(out(10L)._2 - (3 * math.log(0.5))) < 1e-3)
    // doc 11 | a: ln(.5) + 2*ln(1/6) + ln(2/6) = -5.3753
    //        | b: ln(.5) + 2*ln(2/5) + ln(2/5) = -3.4420 -> pred b
    assert(out(11L)._1 == "b")
    assert(math.abs(out(11L)._2 -
      (math.log(0.5) + 3 * math.log(0.4))) < 1e-3)
  }

  test("all-OOV doc falls back to priors; exact tie breaks label asc") {
    val out = NaiveBayes
      .trainPredict(train, Seq((12L, "zebra")).toDF("doc_id", "text"),
        "doc_id", "text", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // equal priors ln(1/2) on both classes -> rounded tie -> 'a'
    assert(out.toSeq == Seq((12L, "a",
      math.floor(math.log(0.5) * 1e4 + 0.5 + 1e-6) / 1e4)))
  }

  test("featureOdds ranks by the exact smoothed odds ratio") {
    val out = NaiveBayes
      .featureOdds(train.select($"label", $"text"), "text", "label",
        "a", "b", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // cat: ((2+1)/(3+3)) / ((0+1)/(2+3)) = 0.5/0.2  = 2.5
    // dog: ((1+1)/6)     / ((1+1)/5)    = (1/3)/0.4 = 0.8333
    // fish:((0+1)/6)     / ((1+1)/5)    = (1/6)/0.4 = 0.4167
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq((1L, "cat"), (2L, "dog"), (3L, "fish")))
    assert(math.abs(out(0)._5 - 2.5) < 1e-9)
    assert(math.abs(out(1)._5 - 0.8333) < 1e-9)
    assert(out(0)._3 == 2L && out(0)._4 == 0L) // raw counts surface
  }

  test("logOddsModel selects by deviation; scoreWithModel is a " +
    "shuffle-free projection with hand-computed scores") {
    // deviation key greatest(odds, 1/odds):
    //   cat 2.5, fish 1/0.4167=2.4, dog 1/0.8333=1.2 -> top-2 keeps
    //   cat + fish, drops dog
    val (prior, weights) = NaiveBayes.logOddsModel(
      train, "text", "label", "a", "b", maxTerms = 2)
    assert(prior == 0.0) // 1 doc per class
    assert(weights.map(_._1).toSet == Set("cat", "fish"))
    val wCat = weights.toMap.apply("cat")
    assert(math.abs(wCat - math.log(2.5)) < 1e-12)

    val scored = NaiveBayes.scoreWithModel(
      Seq((10L, "cat cat"), (11L, "fish"), (12L, "zebra"), (13L, "dog"))
        .toDF("doc_id", "text"),
      "text", prior, weights, "a", "b")
    val out = scored.collect()
      .map(row => row.getLong(0) -> (row.getString(3), row.getDouble(2)))
      .toMap
    assert(out(10L)._1 == "a" &&
      math.abs(out(10L)._2 - 1.8326) < 1e-9) // 2*ln(2.5) r4
    assert(out(11L)._1 == "b") // ln(1/6)-ln(2/5) < 0
    assert(out(12L)._1 == "a" && out(12L)._2 == 0.0) // OOV -> prior, >=0
    assert(out(13L)._1 == "a" && out(13L)._2 == 0.0) // dog dropped by cap
    // the scoring stage must be a pure per-row projection — no
    // exchange, no aggregation: that is the stateless-stream contract
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
  }

  test("randomized corpora match an independent scalar NB reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

    val word = Gen.oneOf("x", "y", "z", "w", "q")
    val doc = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val genCase = for {
      nTrain <- Gen.choose(2, 6)
      nTest <- Gen.choose(1, 4)
      trainDocs <- Gen.listOfN(nTrain, Gen.zip(Gen.oneOf("a", "b"), doc))
      testDocs <- Gen.listOfN(nTest, doc)
    } yield (trainDocs, testDocs)

    def refNb(tr: Seq[(String, String)], te: Seq[(Long, String)])
        : Map[Long, (String, Double)] = {
      def toks(s: String) = s.split(" ").filter(_.nonEmpty).toSeq
      val tt = tr.flatMap { case (lab, t) => toks(t).map(lab -> _) }
      val nTc = tt.groupBy(identity).map { case (k, v) => k -> v.size }
      val nC = tt.groupBy(_._1).map { case (k, v) => k -> v.size }
      val vocab = tt.map(_._2).distinct.toSet
      val v = vocab.size
      val docsC = tr.filter(d => toks(d._2).nonEmpty)
        .groupBy(_._1).map { case (k, xs) => k -> xs.size }
      val total = docsC.values.sum
      val labels = docsC.keys.toSeq.sorted
      def r4(x: Double) = math.floor(x * 1e4 + 0.5 + 1e-6) / 1e4
      te.map { case (id, t) =>
        val cnt = toks(t).filter(vocab).groupBy(identity)
          .map { case (k, v2) => k -> v2.size }
        val scored = labels.map { c =>
          val s = math.log(docsC(c).toDouble / total) + cnt.map {
            case (tk, n) => n * math.log(
              (nTc.getOrElse((c, tk), 0) + 1).toDouble / (nC(c) + v))
          }.sum
          c -> r4(s)
        }
        id -> scored.sortBy { case (c, s) => (-s, c) }.head
      }.toMap
    }

    samples(genCase, 6).foreach { case (trainDocs, testDocs) =>
      val tr = trainDocs.zipWithIndex
        .map { case ((lab, t), i) => (i.toLong, lab, t) }
        .toDF("doc_id", "label", "text")
      val te = testDocs.zipWithIndex
        .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val got = NaiveBayes.trainPredict(tr, te, "doc_id", "text", "label")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
        .toMap
      val want = refNb(trainDocs, testDocs.zipWithIndex
        .map { case (t, i) => (100L + i, t) })
      assert(got.keySet == want.keySet)
      got.foreach { case (id, (p, s)) =>
        assert(p == want(id)._1, s"pred mismatch doc $id: $got vs $want")
        assert(math.abs(s - want(id)._2) < 1e-9, s"score mismatch doc $id")
      }
    }
  }

  test("label never present degenerates cleanly (single-class argmax)") {
    val oneClass = Seq((1L, "a", "cat dog")).toDF("doc_id", "label", "text")
    val out = NaiveBayes
      .trainPredict(oneClass, Seq((9L, "cat")).toDF("doc_id", "text"),
        "doc_id", "text", "label")
      .collect()
    assert(out.length == 1 && out(0).getString(1) == "a")
  }
}
