package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-5 operators: duplicated-span coverage, PageRank, SCD2,
  * TF-IDF, weighted sampling — semantics pinned on hand-computable
  * frames. */
class Round5Spec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------ DupSpans

  private val spanDocs = Seq(
    // docs 0 and 1 share the 8-token prefix "a b c d e f g h"
    (0L, "a b c d e f g h unique zero tail"),
    (1L, "a b c d e f g h other one ending"),
    (2L, "totally different words in this document here now extra"),
    (3L, "short doc"), // < k tokens -> no grams
    (4L, "")           // empty -> no tokens
  ).toDF("doc_id", "text")

  test("DupSpans.spanGramOccurrences windows and positions") {
    val occ = DupSpans.spanGramOccurrences(spanDocs, "doc_id", "text", k = 8)
      .collect()
    // doc0: 11 tokens -> 4 windows; doc1: 11 -> 4; doc2: 9 -> 2
    assert(occ.count(_.getLong(0) == 0L) == 4)
    assert(occ.count(_.getLong(0) == 1L) == 4)
    assert(occ.count(_.getLong(0) == 2L) == 2)
    assert(!occ.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
    assert(occ.filter(_.getLong(0) == 0L).map(_.getLong(1)).sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
  }

  test("DupSpans.spanStats: shared prefix flagged, coverage counted") {
    val st = DupSpans.spanStats(spanDocs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st.size == 5)
    // only the pos-1 window ("a b c d e f g h") is shared
    val d0 = st(0L)
    assert(d0.getLong(1) == 11L)        // n_tokens
    assert(d0.getLong(2) == 4L)         // n_grams
    assert(d0.getLong(3) == 1L)         // n_dup_grams
    assert(d0.getLong(4) == 8L)         // covered: tokens 1..8
    assert(math.abs(d0.getDouble(5) - 0.25) < 1e-15)
    assert(math.abs(d0.getDouble(6) - 8.0 / 11) < 1e-15)
    val d2 = st(2L)
    assert(d2.getLong(3) == 0L && d2.getLong(4) == 0L)
    val d3 = st(3L)
    assert(d3.getLong(1) == 2L && d3.getLong(2) == 0L
      && d3.getDouble(5) == 0.0)
    val d4 = st(4L)
    assert(d4.getLong(1) == 0L && d4.getDouble(6) == 0.0)
  }

  test("DupSpans.removeDuplicatedSpans: covered tokens cut, text " +
      "rebuilt in order, edge docs intact") {
    val docs = Seq(
      (0L, Some("a b c d e f g h unique zero tail")),
      (1L, Some("a b c d e f g h other one ending")),
      (2L, Some("totally different words in this document here now extra")),
      (3L, Some("short doc")),
      (4L, Some("")),
      (5L, Option.empty[String]),
      // fully duplicated against doc 6b below
      (6L, Some("x1 x2 x3 x4 x5 x6 x7 x8")),
      (7L, Some("x1 x2 x3 x4 x5 x6 x7 x8"))
    ).toDF("doc_id", "text")
    val out = DupSpans.removeDuplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(2)), Option(r.get(3)).map(_.toString.toLong)))
      .toMap
    // shared 8-token prefix removed, tails survive in order
    assert(out(0L) == (Some("unique zero tail"), Some(8L)))
    assert(out(1L) == (Some("other one ending"), Some(8L)))
    // untouched docs rebuild identically with zero removed
    assert(out(2L) ==
      (Some("totally different words in this document here now extra"),
        Some(0L)))
    assert(out(3L) == (Some("short doc"), Some(0L)))
    assert(out(4L) == (Some(""), Some(0L)))
    assert(out(5L) == (None, None))
    // fully-duplicated docs collapse to empty strings (all occurrences
    // removed — the conservative contamination policy)
    assert(out(6L) == (Some(""), Some(8L)))
    assert(out(7L) == (Some(""), Some(8L)))
  }

  test("DupSpans.removeDuplicatedSpans: within-doc repeats count") {
    // one doc repeating its own 8-token block back-to-back: both
    // occurrences of the window family are duplicated -> whole doc cut
    val docs = Seq(
      (0L, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
      (1L, "n1 n2 n3 n4 n5 n6 n7 n8 n9")
    ).toDF("doc_id", "text")
    val out = DupSpans.removeDuplicatedSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(out(0L)._2 == 16L, s"expected the whole doc cut, got $out")
    assert(out(0L)._1 == "")
    assert(out(1L) == ("n1 n2 n3 n4 n5 n6 n7 n8 n9", 0L))
  }

  test("DupSpans: overlapping dup windows merge in coverage") {
    // 9-token shared run -> two overlapping 8-windows covering 9 tokens
    val docs = Seq(
      (0L, "a b c d e f g h i x"),
      (1L, "a b c d e f g h i y")
    ).toDF("doc_id", "text")
    val st = DupSpans.spanStats(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(st(0L).getLong(3) == 2L)  // both windows duplicated
    assert(st(0L).getLong(4) == 9L)  // union of [1,8] and [2,9]
  }

  test("DupSpans.filterByCoverage gates on the bound (strict <)") {
    val kept = DupSpans.filterByCoverage(spanDocs, "doc_id", "text",
      k = 8, maxCoverage = 8.0 / 11).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // docs 0,1 sit exactly ON the bound -> dropped; 2,3,4 kept
    assert(kept == Seq(2L, 3L, 4L))
  }

  // --------------------------------------------------------------- Graph

  test("Graph.pagerank: uniform on a symmetric cycle, sums to 1") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("b", "a"), ("c", "b"), ("a", "c")).toDF("src", "dst")
    val r = Graph.pagerank(edges, "src", "dst", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
  }

  test("Graph.pagerank: dangling mass redistributed, hub outranks leaf") {
    // star into a sink: a->c, b->c; c dangles. iterations=25 is the
    // regression guard for the r5 lineage blowup: with persist-only
    // materialization the analyzed plan doubled per iteration (~2^n)
    // and the driver OOMed by n=10 building plan strings.
    val edges = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, "src", "dst", iterations = 25)
    // flat lineage: the result must be a checkpoint-backed leaf, not
    // a 25-deep join tree — its analyzed plan stays tiny
    assert(ranks.queryExecution.analyzed.treeString.length < 4000,
      "pagerank result plan grew with iteration count")
    val r = ranks.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // mass conserved
    assert(r("c") > r("a"))
    assert(math.abs(r("a") - r("b")) < 1e-12)   // symmetric leaves
  }

  test("Dedup.clusterPairs: high-diameter path converges, plan bounded") {
    // a 30-node path has diameter 29 — the min-label propagates one
    // hop per round, so this walks ~15 rounds (label drops via both
    // directions) and would OOM the driver under the old persist-only
    // loop (plan doubled per round). maxIter=40 covers convergence.
    val n = 30
    val nodes = (0L until n.toLong).toDF("id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    val out = Dedup.clusterPairs(nodes, "id", pairs, maxIter = 40)
    assert(out.queryExecution.analyzed.treeString.length < 4000,
      "clusterPairs result plan grew with round count")
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 0L))
  }

  test("Graph.degrees") {
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "d")
    val deg = Graph.degrees(edges, "s", "d")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(deg("a") == (2L, 0L, 2L))
    assert(deg("b") == (1L, 1L, 2L))
    assert(deg("c") == (0L, 2L, 2L))
  }

  test("Graph.triangles: exact counts, direction/dup/self-loop immune") {
    // triangle 1-2-3, pendant 3-4, plus a duplicate reversed edge and
    // a self loop that must not change anything
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (2L, 1L), (5L, 5L)).toDF("s", "d")
    val out = Graph.triangles(edges, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // K4: every node sits in C(3,2)=3 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("s", "d")
    val got = Graph.triangles(k4, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == (1L to 4L).map(_ -> 3L))
    // triangle-free bipartite graph -> empty
    val bip = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)).toDF("s", "d")
    assert(Graph.triangles(bip, "s", "d").count() == 0)
  }

  test("Graph.triangles: wedge batching sums to the one-shot counts") {
    // random-ish dense graph with overlapping triangles so several
    // apex slices are non-empty and partials genuinely sum
    val edges = (for { a <- 1L to 24L; b <- 1L to 24L
      if a < b && (a * 7 + b * 13) % 3 != 0 } yield (a, b)).toDF("s", "d")
    val one = Graph.triangles(edges, "s", "d")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(one.nonEmpty)
    for (b <- Seq(2, 5))
      assert(Graph.triangles(edges, "s", "d", wedgeBatches = b)
        .orderBy("node").as[(Long, Long)].collect().toSeq == one,
        s"wedgeBatches=$b diverged")
    // batching composes with degree salting
    assert(Graph.triangles(edges, "s", "d", saltBuckets = 3,
      wedgeBatches = 3).orderBy("node").as[(Long, Long)].collect()
      .toSeq == one)
  }

  // ----------------------------------------------------------------- Scd

  test("Scd.scd2 collapses runs and closes intervals") {
    val events = Seq(
      (1L, "O", "2024-01-01", 10L),
      (1L, "O", "2024-01-05", 11L),  // same status -> same run
      (1L, "F", "2024-02-01", 12L),  // change -> version 2
      (1L, "O", "2024-03-01", 13L),  // change back -> version 3
      (2L, "P", "2024-01-15", 20L)
    ).toDF("k", "status", "dt", "id")
      .withColumn("dt", to_date(col("dt")))
    val out = Scd.scd2(events, Seq("k"), Seq("status"), Seq("dt", "id"), "dt")
      .orderBy("k", "version").collect()
    assert(out.length == 4)
    val v1 = out(0)
    assert(v1.getLong(1) == 1L && v1.getString(2) == "O"
      && v1.getAs[Long]("n_events") == 2L)
    assert(v1.getDate(3).toString == "2024-01-01"
      && v1.getDate(4).toString == "2024-02-01"
      && !v1.getBoolean(5).asInstanceOf[Boolean])
    val v3 = out(2)
    assert(v3.getLong(1) == 3L && v3.getString(2) == "O"
      && v3.isNullAt(4) && v3.getBoolean(5))
    val k2 = out(3)
    assert(k2.getLong(0) == 2L && k2.getLong(1) == 1L && k2.getBoolean(5))
  }

  test("Scd.scd2 null-safe change detection; Scd.asOf point lookup") {
    val events = Seq(
      (1L, Option.empty[String], "2024-01-01", 1L),
      (1L, Some("A"), "2024-02-01", 2L),   // NULL -> A is a change
      (1L, Option.empty[String], "2024-03-01", 3L) // A -> NULL is a change
    ).toDF("k", "status", "dt", "id")
      .withColumn("dt", to_date(col("dt")))
    val scd = Scd.scd2(events, Seq("k"), Seq("status"), Seq("dt", "id"), "dt")
    assert(scd.count() == 3)
    val at = Scd.asOf(scd, to_date(lit("2024-02-15"))).collect()
    assert(at.length == 1 && at(0).getString(2) == "A")
  }

  // --------------------------------------------------------------- Tfidf

  test("Tfidf.topTerms ranks by tf/df with term tie-break") {
    val docs = Seq(
      (0L, "apple apple banana cherry"),
      (1L, "banana cherry cherry date"),
      (2L, "date date date elderberry")
    ).toDF("doc_id", "text")
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
    assert(top.length == 6)
    // doc0: apple tf=2 df=1 -> 2.0 wins; banana/cherry tf=1 df=2 tie
    //       -> banana by term order
    assert(top(0).getString(2) == "apple" && top(0).getLong(3) == 2L
      && top(0).getLong(4) == 1L)
    assert(top(1).getString(2) == "banana")
    // doc2: date tf=3 df=2 -> 1.5 beats elderberry 1/1
    assert(top(4).getString(2) == "date")
    assert(top(5).getString(2) == "elderberry")
    // display score: tf * (ln((1+N)/(1+df)) + 1)
    val expected = 2.0 * (math.log(4.0 / 2.0) + 1)
    assert(math.abs(top(0).getDouble(5) - expected) < 1e-12)
  }

  test("Tfidf: empty docs emit no rows; k bounds output") {
    val docs = Seq((0L, "a b c"), (1L, "")).toDF("doc_id", "text")
    val top = Tfidf.topTerms(docs, "doc_id", "text", k = 5).collect()
    assert(top.forall(_.getLong(0) == 0L))
    assert(top.length == 3)
  }

  // ------------------------------------------------------ weightedSample

  test("Sampling.weightedSample: deterministic, k-bounded, weight-biased") {
    val rows = (1L to 400L).map(i =>
      (i, if (i <= 200) 1.0 else 100.0)).toDF("id", "w")
    val s1 = Sampling.weightedSample(rows, "id", "w", k = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.weightedSample(rows, "id", "w", k = 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 50) // reproducible, exactly k
    // 100x weight -> heavy ids dominate the sample
    val heavy = s1.count(_ > 200L)
    assert(heavy > 40, s"expected heavy-weight dominance, got $heavy/50")
  }

  test("Sampling.weightedSample: equal weights approximate uniform") {
    val rows = (1L to 1000L).map(i => (i, 5.0)).toDF("id", "w")
    val s = Sampling.weightedSample(rows, "id", "w", k = 100)
      .select("id").collect().map(_.getLong(0))
    assert(s.length == 100)
    // md5-hash order has no id bias: both halves represented
    assert(s.count(_ <= 500L) > 20 && s.count(_ > 500L) > 20)
  }

  test("Sampling.shuffleShard: reproducible permutation, balanced " +
      "shards, seed independence") {
    val rows = (0L until 1000L).map(i => (i, s"d$i")).toDF("id", "s")
    def run(seed: Long) = Sampling.shuffleShard(rows, "id", seed, 8)
      .select("id", "shard", "pos")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
      .toMap
    val a = run(7); val b = run(7); val c = run(8)
    assert(a == b) // same seed = bit-identical order
    assert(a != c) // new seed = fresh permutation (epoch reshuffle)
    // every row present exactly once; positions dense 1..n per shard
    assert(a.size == 1000)
    val byShard = a.values.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    byShard.foreach { case (sh, ps) =>
      assert(ps.sorted == (1L to ps.size), s"shard $sh positions not dense")
    }
    // uniform hash -> balanced shards (expected 125 per shard)
    assert(byShard.values.map(_.size).forall(n => n > 80 && n < 170),
      byShard.view.mapValues(_.size).toMap.toString)
    // in-shard order is hash order, not id order (it IS a shuffle)
    val shard0 = a.toSeq.filter(_._2._1 == 0).sortBy(_._2._2).map(_._1)
    assert(shard0 != shard0.sorted)
  }

  test("Sampling.leakageSafeSplit: dup families share a split, " +
      "singletons split independently, assignment is stable") {
    // 3 near-identical docs (one family) + singletons whose char-5-gram
    // shingle sets are pairwise DISJOINT (a repeated per-doc two-letter
    // code) — templated "unique document number $i" texts are ~90%
    // character-identical and correctly pair under char-shingle minhash
    val family = (0L until 3L).map(i =>
      (i, "the exact same boilerplate paragraph appears here verbatim"))
    val singles = (10L until 40L).map { i =>
      val code = "" + ('a' + (i / 26).toInt).toChar + ('a' + (i % 26).toInt).toChar
      (i, code * 12)
    }
    val docs = (family ++ singles).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.8).select("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
        Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(split.size == 33)
    // the whole family lands in ONE split
    assert(Set(split(0L), split(1L), split(2L)).size == 1)
    // singletons are assigned per their own component (their id) —
    // identical to plain assignSplit keyed by doc_id
    val plain = Sampling.assignSplit(docs.filter(col("doc_id") >= 10),
        "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (10L until 40L).foreach(i => assert(split(i) == plain(i)))
    // both splits are actually populated
    assert(split.values.toSet == Set("train", "test"))
  }

  test("Sampling.leakageSafeSplitByFingerprint: dup family cohesion, " +
      "NULL text joins the empty-text family, no row loss") {
    val docs = Seq(
      (0L, "same text here"), (1L, "same text here"),   // family A
      (2L, null), (3L, ""), (4L, "   "),                // contentless family
      (5L, "its own words entirely"))
      .toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplitByFingerprint(docs, "doc_id",
        "text", Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 6) // every row survives, including NULL text
    assert(out(0L) == out(1L))
    // NULL, empty and whitespace-only all fingerprint as '' → one family
    assert(Set(out(2L), out(3L), out(4L)).size == 1)
    // family fate = the fate assignSplit gives the min id
    val plain = Sampling.assignSplit(docs.select("doc_id"), "doc_id",
        Seq("train" -> 0.8, "test" -> 0.2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == plain(0L) && out(5L) == plain(5L))
  }

  test("Sampling.leakageSafeSplit keeps NULL-id rows (left join + " +
      "own-id fallback, never an inner-join drop)") {
    val docs = Seq(Some(1L), Some(2L), None)
      .toDF("doc_id").withColumn("text", lit("x"))
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "test" -> 0.2))
    assert(out.count() == 3)
    assert(out.filter(col("doc_id").isNull).count() == 1)
  }

  test("Sampling.shuffleShard preserves a user column named _h") {
    // The hash used to be written into a hard-coded `_h`, silently
    // overwriting (then dropping) a user column of that name.
    val rows = Seq((1L, "keep1"), (2L, "keep2")).toDF("id", "_h")
    val out = Sampling.shuffleShard(rows, "id", seed = 7, nShards = 2)
    assert(out.columns.toSeq == Seq("id", "_h", "shard", "pos"))
    assert(out.select("_h").collect().map(_.getString(0)).sorted.toSeq
      == Seq("keep1", "keep2"))
  }
}
