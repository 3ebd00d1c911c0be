package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-6 operators: C4 line-level cleaning, corpus bigram LM
  * scoring, SCD1 latest snapshot — semantics pinned on
  * hand-computable frames. */
class Round6Spec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------ C4

  test("Text.withC4Flags: line retention, page gates, NULL text") {
    val docs = Seq(
      (0L, "One good sentence with enough words here.\n" +
        "short.\nAnother good sentence with enough words there!\n" +
        "A third fine sentence rounds out this page."),
      (1L, "Contains lorem ipsum so the page fails.\n" +
        "Other sentence one has the needed words.\n" +
        "Other sentence two has the needed words.\n" +
        "Other sentence three has the needed words."),
      (2L, "A brace { appears so the page fails.\n" +
        "Good sentence one carries the required words.\n" +
        "Good sentence two carries the required words.\n" +
        "Good sentence three carries the required words."),
      (3L, "Enable javascript to use this site today.\n" +
        "Real sentence one carries the required words.\n" +
        "Real sentence two carries the required words.\n" +
        "Real sentence three carries the required words."),
      (4L, "Too few sentences on this page exist."),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Text.withC4Flags(docs, "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val d0 = out(0L)
    assert(d0.getAs[Long]("n_lines") == 4 &&
      d0.getAs[Long]("n_lines_kept") == 3)
    assert(d0.getAs[Long]("n_sentences") == 3 &&
      d0.getAs[Boolean]("c4_pass"))
    assert(!d0.getAs[String]("clean_text").contains("short"))

    assert(!out(1L).getAs[Boolean]("c4_pass")) // lorem ipsum page gate
    assert(!out(2L).getAs[Boolean]("c4_pass")) // curly brace page gate
    // javascript LINE dropped but the page still passes on the rest
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_lines_kept") == 3 &&
      d3.getAs[Boolean]("c4_pass"))
    assert(!d3.getAs[String]("clean_text").contains("javascript"))
    assert(!out(4L).getAs[Boolean]("c4_pass")) // < 3 sentences
    assert(out(5L).isNullAt(out(5L).fieldIndex("c4_pass")))
  }

  test("Text.c4Clean replaces text with retained lines, drops failures") {
    val docs = Seq(
      (0L, "First good sentence carries the needed words.\ndrop me\n" +
        "Second good sentence carries the needed words.\n" +
        "Third good sentence carries the needed words."),
      (1L, "no sentences at all here")
    ).toDF("doc_id", "text")
    val kept = Text.c4Clean(docs, "text").collect()
    assert(kept.length == 1 && kept(0).getLong(0) == 0L)
    assert(kept(0).getString(1).linesIterator.size == 3)
    assert(kept(0).schema.fieldNames.toSeq == Seq("doc_id", "text"))
  }

  // ------------------------------------------------------------- LmScore

  test("LmScore.bigramRows emits consecutive pairs; short docs none") {
    val docs = Seq((0L, "a b c"), (1L, "x"), (2L, "")).toDF("doc_id", "text")
    val bg = LmScore.bigramRows(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(bg.toSet == Set((0L, "a", "b"), (0L, "b", "c")))
  }

  test("LmScore.scoreDocs: hand-computed add-one bigram logprobs") {
    // corpus: doc0 "a b a b", doc1 "a b"  -> bigrams:
    //   doc0: (a,b) (b,a) (a,b); doc1: (a,b)
    // C(a,b)=3, C(b,a)=1, C(a)=3, C(b)=1 (as w1), V=2 (tokens a,b)
    val docs = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pAB = math.log(4.0 / 5.0) // (3+1)/(3+2)
    val pBA = math.log(2.0 / 3.0) // (1+1)/(1+2)
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2 - (2 * pAB + pBA) / 3) < 1e-12)
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - pAB) < 1e-12)
  }

  test("LmScore.filterByScore keeps high-probability docs only") {
    // "z z" uses a bigram seen nowhere else -> lowest score
    val docs = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z q"))
      .toDF("doc_id", "text")
    val scores = LmScore.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(2L) < scores(1L))
    val cut = (scores(1L) + scores(2L)) / 2
    val kept = LmScore.filterByScore(docs, "doc_id", "text", cut)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L))
  }

  // ---------------------------------------------------------- Scd.latest

  test("Scd.latest keeps the most recent event per key (tie-broken)") {
    val events = Seq(
      (1L, "old", "2024-01-01", 10L),
      (1L, "new", "2024-02-01", 11L),
      (1L, "tie-lo", "2024-02-01", 12L),
      (1L, "tie-hi", "2024-02-01", 13L), // same date, max id wins
      (2L, "only", "2024-01-15", 20L)
    ).toDF("k", "status", "dt", "id")
      .withColumn("dt", to_date(col("dt")))
    val out = Scd.latest(events, Seq("k"), Seq("dt", "id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "tie-hi", 2L -> "only"))
    // input schema preserved, no helper columns
    assert(Scd.latest(events, Seq("k"), Seq("dt", "id"))
      .schema.fieldNames.toSeq == events.schema.fieldNames.toSeq)
  }

  // ------------------------------------------------- kNN graph/clusters

  private def vecFixture = Seq(
    (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.8f, 0.2f)),
    (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.1f, 0.9f))
  ).toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  test("Similarity.knnGraph: top-k neighbors, self excluded, edge gate") {
    val g = Similarity.knnGraph(vecFixture, "vec_id", "embedding",
        k = 2, method = "brute")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3)))
    assert(g.length == 10) // 5 nodes x k=2
    assert(!g.exists(e => e._1 == e._2)) // no self edges
    // node 1's nearest is 2, then 3
    assert(g.filter(_._1 == 1L).sortBy(_._4).map(_._2).toSeq == Seq(2L, 3L))
    // minCosine gates edges but keeps the original rank
    val gated = Similarity.knnGraph(vecFixture, "vec_id", "embedding",
        k = 2, method = "brute", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gated.nonEmpty && gated.forall { case (a, b) =>
      (a <= 3L && b <= 3L) || (a >= 4L && b >= 4L) }) // no cross-cluster
  }

  test("Similarity.knnGraph: query-slice batching is byte-identical to one-shot") {
    // larger fixture so several hash slices are non-empty and the
    // lsh path exercises buckets/probes/rerank per slice
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    def run(b: Int) = Similarity.knnGraph(vecs, "vec_id", "embedding",
        k = 3, method = "lsh", planes = 4, probeBits = 3,
        queryBatches = b)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9), r.getInt(3))).toSeq
    val one = run(1)
    assert(one.nonEmpty)
    for (b <- Seq(2, 7))
      assert(run(b) == one, s"queryBatches=$b diverged")
    // lsh-only knob: brute rejects it instead of silently ignoring it
    intercept[IllegalArgumentException] {
      Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3,
        method = "brute", queryBatches = 2)
    }
  }

  test("Similarity.semanticClusters: components of the gated kNN graph") {
    val out = Similarity.semanticClusters(vecFixture, "vec_id",
        "embedding", k = 2, minCosine = 0.9, method = "brute")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // every row appears
    assert(Set(out(1L), out(2L), out(3L)).size == 1) // one x-axis cluster
    assert(Set(out(4L), out(5L)).size == 1)          // one y-axis cluster
    assert(out(1L) != out(4L))
    assert(out(1L) == 1L && out(4L) == 4L) // labeled by min member
  }

  // --------------------------------------------- incremental near-dup

  test("nearDupCleaned drops batch near-dups of the reference only") {
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "completely unrelated reference content sits here quietly")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "brand new text that matches nothing in the stored corpus")
    ).toDF("doc_id", "text")
    val kept = IncrementalDedup.nearDupCleaned(batch, ref,
        "doc_id", "text", threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // doc 1 exact dup, doc 2 near dup (one word changed) -> dropped
    assert(kept == Seq(3L))
    // empty reference keeps everything; empty batch stays empty
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(IncrementalDedup.nearDupCleaned(batch, empty, "doc_id", "text")
      .count() == 3)
    assert(IncrementalDedup.nearDupCleaned(empty, ref, "doc_id", "text")
      .count() == 0)
    // batch-internal dups are NOT this operator's business: two new
    // near-identical batch docs both survive
    val twins = Seq(
      (1L, "some fresh sentence repeated almost verbatim here today"),
      (2L, "some fresh sentence repeated almost verbatim here today!")
    ).toDF("doc_id", "text")
    assert(IncrementalDedup.nearDupCleaned(twins, ref, "doc_id", "text")
      .count() == 2)
  }

  // ------------------------------------------------- budget-mass mixing

  test("mixToBudgetWeights: realized budget shares track the targets") {
    // source a: few huge docs; source b: many small docs — a doc-count
    // mix would starve a's budget share, the budget mix must not
    val rows = (1 to 10).map(i => (i.toLong, "a", 1000L)) ++
      (11 to 110).map(i => (i.toLong, "b", 10L))
    val df = rows.toDF("id", "src", "n_tok")
    val out = Sampling.mixToBudgetWeights(df, "src", "id", "n_tok",
        Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val aMass = out.filter(_._1 == "a").map(_._2).sum.toDouble
    val bMass = out.filter(_._1 == "b").map(_._2).sum.toDouble
    // binding source kept whole: b has the smaller mass/weight ratio
    assert(bMass == 1000.0)
    // a downsampled toward equal mass; hash banding is per-row so
    // allow sampling noise around the 1000-token target
    assert(aMass >= 500.0 && aMass <= 2000.0, s"aMass=$aMass")
    // deterministic across invocations: identical kept-row set
    val kept = Sampling.mixToBudgetWeights(df, "src", "id", "n_tok",
        Map("a" -> 0.5, "b" -> 0.5)).collect().map(_.getLong(0)).sorted.toSeq
    val again = Sampling.mixToBudgetWeights(df, "src", "id", "n_tok",
        Map("a" -> 0.5, "b" -> 0.5)).collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == again)
    // unknown sources are dropped
    val dropped = Sampling.mixToBudgetWeights(df, "src", "id", "n_tok",
      Map("a" -> 1.0))
    assert(dropped.select("src").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("a"))
  }

  // ------------------------------------------------------- fuzzy pairs

  test("FuzzyJoin.selfFuzzyPairs: blocked match, canonical pairs") {
    val names = Seq(
      (1L, "Blue Bolt"), (2L, "blue belt"), // dist 1, share 'blue'
      (3L, "red widget"), (4L, "red midget"), // dist 1, share 'red'
      (5L, "green gear"), (6L, "totally other") // no partner
    ).toDF("id", "name")
    val out = FuzzyJoin.selfFuzzyPairs(names, "id", "name",
        maxDistance = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSet == Set((1L, 2L, 1L), (3L, 4L, 1L)))
    // strings are compared normalized (case folded)
    val strs = FuzzyJoin.selfFuzzyPairs(names, "id", "name", 2)
      .collect().map(_.getString(2))
    assert(strs.forall(s => s == s.toLowerCase))
  }

  test("FuzzyJoin.fuzzyMatch: cross-table pairs, both directions kept") {
    val batch = Seq((1L, "blue bolt"), (2L, "green widget"))
      .toDF("id", "name")
    val master = Seq((10L, "blue belt"), (11L, "blue bolt"),
      (12L, "unrelated thing")).toDF("mid", "mname")
    val out = FuzzyJoin.fuzzyMatch(batch, master, "id", "name",
        "mid", "mname", maxDistance = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // batch 1 matches master 10 (dist 1) and 11 (dist 0); batch 2 none
    assert(out.toSet == Set((1L, 10L, 1L), (1L, 11L, 0L)))
    // sides are not canonicalized: ids can coincide across tables
    val same = FuzzyJoin.fuzzyMatch(batch, batch, "id", "name",
      "id", "name", maxDistance = 0)
    assert(same.count() == 2) // each row matches itself exactly
  }

  test("FuzzyJoin: typo in one block token still pairs via the other") {
    val names = Seq((1L, "alpha beta"), (2L, "alphq beta"))
      .toDF("id", "name") // first tokens differ; last token shared
    assert(FuzzyJoin.selfFuzzyPairs(names, "id", "name", 1).count() == 1)
  }

  test("FuzzyJoin: maxBlock drops oversized blocks; empty/null safe") {
    val names = Seq((1L, "x a"), (2L, "x b"), (3L, "x c"),
      (4L, "y solo"), (5L, null.asInstanceOf[String]), (6L, "  "))
      .toDF("id", "name")
    // block 'x' has 3 members -> dropped at cap 2; a/b/c singleton keys
    val capped = FuzzyJoin.selfFuzzyPairs(names, "id", "name",
      maxDistance = 2, maxBlock = 2)
    assert(capped.count() == 0)
    val uncapped = FuzzyJoin.selfFuzzyPairs(names, "id", "name", 2)
    assert(uncapped.count() == 3) // x-a/x-b, x-a/x-c, x-b/x-c
  }

  // -------------------------------------------------------- top n-grams

  test("Ngrams.topNgrams: counts, doc reach, deterministic rank") {
    val docs = Seq(
      (0L, "the cat sat"),          // bigrams: the cat, cat sat
      (1L, "the cat ran the cat"),  // the cat x2, cat ran, ran the
      (2L, "dog")                   // too short: none
    ).toDF("doc_id", "text")
    val out = Ngrams.topNgrams(docs, "doc_id", "text", n = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out(0) == ((1L, "the cat", 3L, 2L))) // 3 occurrences, 2 docs
    // count-1 grams tie-broken alphabetically
    assert(out.map(_._2).toSeq == Seq("the cat", "cat ran", "cat sat"))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  test("Ngrams.ngramArray: short docs empty; punctuation normalized") {
    val docs = Seq((0L, "Hello, world! Hi."), (1L, "one")).toDF("id", "t")
    val got = docs.select(col("id"),
        Ngrams.ngramArray(col("t"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) == Seq("hello world", "world hi"))
    assert(got(1L) == Seq.empty)
  }

  // -------------------------------------------- percentile band filter

  test("Percentiles.filterByBand: per-group trim, ties kept together") {
    val rows = (1 to 10).map(v => ("a", v.toLong)) ++
      Seq(("b", 5L), ("b", 5L), ("b", 9L)) ++ // tied minimums
      Seq(("c", 7L)) // single-row group: pr = 0.0
    val df = rows.toDF("g", "v")
    val out = Percentiles.filterByBand(df, Seq("g"), "v", 0.2, 0.8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // group a: pr = (rank-1)/9 -> keep v where 0.2 <= (v-1)/9 <= 0.8
    assert(out.filter(_._1 == "a").map(_._2).sorted.toSeq ==
      (3L to 8L).toSeq)
    // group b: the two 5s share rank 1 (pr 0.0) -> both dropped;
    // 9 has pr 1.0 -> dropped
    assert(!out.exists(_._1 == "b"))
    // single-row group c: pr 0.0, outside [0.2, 0.8]
    assert(!out.exists(_._1 == "c"))
    // band containing 0 keeps it
    val withZero = Percentiles.filterByBand(df, Seq("g"), "v", 0.0, 0.5)
    assert(withZero.filter(col("g") === "c").count() == 1)
    // NULL values dropped
    val withNull = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L)))
      .toDF("g", "v")
    assert(Percentiles.filterByBand(withNull, Seq("g"), "v", 0.0, 1.0)
      .count() == 2)
  }
}
