package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** DSIR importance resampling: scalar reference for the log weight,
  * target-likeness ordering, determinism, empty-doc exclusion, and
  * the scale-shape plan pins (broadcast model, TakeOrdered top-k). */
class DsirSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def hashOf(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Scalar reference: hashed unigram+bigram counts of one doc. */
  private def featRef(text: String, buckets: Int): Map[Long, Long] = {
    val toks = text.toLowerCase.replaceAll("\\p{Punct}", " ")
      .trim.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq
    val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    grams.groupBy(g => hashOf(g) % buckets).map { case (b, g) =>
      b -> g.size.toLong
    }
  }

  test("logw matches the scalar multinomial reference") {
    val B = 32
    val target = Seq((100L, "good clean prose"), (101L, "clean prose wins"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "good clean prose here"), (2L, "junk junk junk spam"))
      .toDF("doc_id", "text")
    val got = Dsir.scoreDocs(raw, target, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // reference model
    val tCounts = Seq("good clean prose", "clean prose wins")
      .map(featRef(_, B)).foldLeft(Map.empty[Long, Long]) { (a, m) =>
        m.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
      }
    val rCounts = Seq("good clean prose here", "junk junk junk spam")
      .map(featRef(_, B)).foldLeft(Map.empty[Long, Long]) { (a, m) =>
        m.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
      }
    val tn = tCounts.values.sum.toDouble
    val rn = rCounts.values.sum.toDouble
    def logw(text: String): Double =
      featRef(text, B).map { case (b, c) =>
        c * (math.log(tCounts.getOrElse(b, 0L) + 1.0) - math.log(tn + B)
          - math.log(rCounts.getOrElse(b, 0L) + 1.0) + math.log(rn + B))
      }.sum
    assert(math.abs(got(1L) - logw("good clean prose here")) < 1e-9)
    assert(math.abs(got(2L) - logw("junk junk junk spam")) < 1e-9)
    // the target-like doc must out-weigh the spam doc
    assert(got(1L) > got(2L))
  }

  test("select favors target-like docs, is deterministic, and a new seed is a different draw") {
    val target = (0 until 20)
      .map(i => (1000L + i, "the quick brown fox jumps high"))
      .toDF("doc_id", "text")
    val raw = ((0 until 20).map(i => (i.toLong, "the quick brown fox runs fast")) ++
      (20 until 40).map(i => (i.toLong, "zzz qqq xxx yyy www vvv")))
      .toDF("doc_id", "text")
    val sel = Dsir.select(raw, target, "doc_id", "text", k = 10,
      buckets = 64, seed = "s1")
    val ids = sel.select("doc_id").as[Long].collect().toSet
    // importance gap is huge (shared vs disjoint vocab): all 10 picks
    // come from the target-like half even after the Gumbel jitter
    assert(ids.forall(_ < 20), s"picked spam docs: $ids")
    assert(sel.columns.contains("dsir_logw") && sel.columns.contains("dsir_key"))
    assert(sel.columns.contains("text")) // raw columns survive
    // same seed = same set; different seed = (here) different set
    val again = Dsir.select(raw, target, "doc_id", "text", k = 10,
      buckets = 64, seed = "s1").select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    val other = Dsir.select(raw, target, "doc_id", "text", k = 10,
      buckets = 64, seed = "s2").select("doc_id").as[Long].collect().toSet
    assert(other != ids) // 20-choose-10 over fresh Gumbels: collision ~0
  }

  test("docs with empty normalized text are never scored or selected") {
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta gamma"), (2L, "..."), (3L, " "))
      .toDF("doc_id", "text")
    val scored = Dsir.scoreDocs(raw, target, "doc_id", "text", buckets = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(scored == Set(1L))
    val sel = Dsir.select(raw, target, "doc_id", "text", k = 3, buckets = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(sel == Set(1L)) // k larger than the scoreable pool: no padding
  }

  test("empty / unscoreable target: empty result, never an arbitrary NULL-scored pick") {
    val raw = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dsir.select(raw, empty, "doc_id", "text", k = 2, buckets = 16)
      .count() == 0)
    // all-empty-text target is the same: no model, no picks
    val blank = Seq((9L, "..."), (8L, " ")).toDF("doc_id", "text")
    assert(Dsir.select(raw, blank, "doc_id", "text", k = 2, buckets = 16)
      .count() == 0)
    // and the target needs ONLY the text column — no id required
    val textOnly = Seq(Tuple1("alpha beta")).toDF("text")
    assert(Dsir.select(raw, textOnly, "doc_id", "text", k = 1, buckets = 16)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("mixture: 1-element blend equals the single-target model; weights steer scores") {
    val B = 32
    val target = Seq((100L, "good clean prose"), (101L, "clean prose wins"))
      .toDF("doc_id", "text")
    val raw = Seq((1L, "good clean prose here"), (2L, "junk junk junk spam"))
      .toDF("doc_id", "text")
    val single = Dsir.scoreDocs(raw, target, "doc_id", "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // K=1 mixture: same model mathematically (log split vs one ln of
    // the blend — identical up to float noise, NOT bit-identical,
    // which is why the plugin routes single targets through select)
    val mix1 = Dsir.scoreDocsMix(raw, Seq((target, 7.0)), "doc_id",
        "text", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (id <- Seq(1L, 2L))
      assert(math.abs(single(id) - mix1(id)) < 1e-9, s"doc $id")

    // two targets: pulling the mixture toward the spam-y corpus must
    // raise the spam doc's weight relative to the even blend
    val spamT = Seq((200L, "junk junk spam spam")).toDF("doc_id", "text")
    def mixScore(wGood: Double, wSpam: Double): Map[Long, Double] =
      Dsir.scoreDocsMix(raw, Seq((target, wGood), (spamT, wSpam)),
        "doc_id", "text", buckets = B)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val even = mixScore(1.0, 1.0)
    val spammy = mixScore(1.0, 9.0)
    assert(spammy(2L) > even(2L),
      s"spam doc should gain weight under a spam-heavy mixture: " +
        s"${spammy(2L)} vs ${even(2L)}")
    // weights are scale-invariant: only ratios matter
    val scaled = mixScore(10.0, 90.0)
    for (id <- Seq(1L, 2L))
      assert(math.abs(spammy(id) - scaled(id)) < 1e-9, s"doc $id")
  }

  test("mixture: one empty target empties the result (NULL-propagated contract)") {
    val raw = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val ok = Seq((9L, "alpha beta")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dsir.selectMix(raw, Seq((ok, 1.0), (empty, 1.0)),
      "doc_id", "text", k = 2, buckets = 16).count() == 0)
    // weight validation
    intercept[IllegalArgumentException] {
      Dsir.scoreDocsMix(raw, Seq((ok, 0.0)), "doc_id", "text", buckets = 16)
    }
    intercept[IllegalArgumentException] {
      Dsir.scoreDocsMix(raw, Nil, "doc_id", "text", buckets = 16)
    }
  }

  test("plan shape: broadcast model join, TakeOrdered top-k, no cartesian blowup") {
    val target = (0 until 8).map(i => (100L + i, s"tok$i tok${i + 1}"))
      .toDF("doc_id", "text")
    val raw = (0 until 32).map(i => (i.toLong, s"tok${i % 8} word$i"))
      .toDF("doc_id", "text")
    val plan = Dsir.select(raw, target, "doc_id", "text", k = 5,
      buckets = 128).queryExecution.executedPlan.toString
    // top-k is a TakeOrderedAndProject over the narrow score frame
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the bucket-model scoring join and the k-row join-back both
    // broadcast; the only nested-loop joins are the 1-row totals
    assert(plan.contains("BroadcastHashJoin"), plan)
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nlj <= 2, s"unexpected nested-loop joins ($nlj):\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
