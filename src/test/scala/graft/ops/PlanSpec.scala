package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Physical-plan assertions for the scale claims the scaladocs make:
  * the approximate-dedup paths must never plan an all-pairs join, and
  * the single-pass operators must not introduce shuffles. A claim
  * like "never quadratic" belongs in a test, not only in prose —
  * plan regressions (a future edit defeating the bucketing) fail
  * here even while small-fixture results stay correct. */
class PlanSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }) ++ p.subqueries
    p +: kids.flatMap(flatten)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] =
    flatten(df.queryExecution.executedPlan)

  private def assertNoAllPairs(df: DataFrame, what: String): Unit = {
    val bad = nodes(df).filter {
      case _: CartesianProductExec => true
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    }
    assert(bad.isEmpty,
      s"$what plans an all-pairs join: ${bad.map(_.nodeName).mkString(", ")}")
  }

  private val docs = ((0L until 40L).map(i => (i, s"doc number $i with shared text body")) ++
    Seq((100L, "doc number 7 with shared text body"))).toDF("doc_id", "text")

  test("minhash candidate pairs never plan an all-pairs join") {
    assertNoAllPairs(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"),
      "minhashCandidatePairs")
  }

  test("minhash star mode (over-cap buckets) never plans an all-pairs join") {
    assertNoAllPairs(
      Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        maxBucket = 2, overCap = "star"),
      "minhashCandidatePairs(star)")
  }

  test("ngramJaccardVerified never plans an all-pairs join") {
    assertNoAllPairs(
      Dedup.ngramJaccardVerified(docs, "doc_id", "text"),
      "ngramJaccardVerified")
  }

  test("simhash pairs never plan an all-pairs join") {
    assertNoAllPairs(
      Dedup.simhashPairs(docs, "doc_id", "text"),
      "simhashPairs")
  }

  test("embedding LSH pairs never plan an all-pairs join") {
    val emb = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val df = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding",
      threshold = 0.3, planes = 4, probeBits = 1)
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
      "embeddingCosinePairs plans a CartesianProduct")
    // the deliberate 1-row saturation-guard scalar attach is the ONLY
    // permissible nested-loop join (same precedent as LmScore/BM25's
    // scalar cross joins); the candidate/verify joins must be keyed
    val bnlj = ns.collect {
      case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.size <= 1, "candidate joins must be keyed, not nested loops")
    bnlj.foreach { j =>
      // the guard's isNull filter is pushed INTO the broadcast side,
      // after which its output prunes to nothing — so the legitimate
      // shapes are the bare guard column or an empty projection;
      // anything else (corpus columns) is a real all-pairs join
      val build =
        (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
          j.right else j.left).output.map(_.name)
      assert(build.isEmpty || build == Seq("_sat_guard"),
        s"non-guard side under a nested-loop join: $build")
    }
  }

  test("SemDeDup never plans an all-pairs join (both assign modes)") {
    val emb = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    for (mode <- Seq("kmeans", "hash"))
      assertNoAllPairs(
        Dedup.semDeDup(emb, "vec_id", "embedding", threshold = 0.4,
          nClusters = 4, assign = mode),
        s"semDeDup($mode)")
  }

  test("IVF-PQ top-k never plans an all-pairs join") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assertNoAllPairs(
      Similarity.ivfPqTopK(e, e.filter($"vec_id" < 5),
        "vec_id", "embedding", k = 3),
      "ivfPqTopK")
  }

  test("Gopher flags are a shuffle-free projection") {
    val flagged = Text.withGopherFlags(docs, "text")
    val shuffles = nodes(flagged).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"gopher flags should be per-row only, found ${shuffles.size} exchanges")
  }

  test("boilerplate removal never plans an all-pairs join") {
    val lined = docs.withColumn("text",
      org.apache.spark.sql.functions.concat($"text",
        org.apache.spark.sql.functions.lit("\nshared footer")))
    assertNoAllPairs(
      Dedup.removeBoilerplateLines(lined, "doc_id", "text", minDocs = 3),
      "removeBoilerplateLines")
  }

  test("mixToWeights adds no shuffle to the kept-rows path") {
    val df = ((0L until 50L).map(i => (i, "a")) ++
      (50L until 100L).map(i => (i, "b"))).toDF("id", "src")
    val mixed = Sampling.mixToWeights(df, "src", "id",
      Map("a" -> 0.5, "b" -> 0.5))
    val shuffles = nodes(mixed).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"mix filter should be a single stage, found ${shuffles.size} exchanges")
  }

  test("sliding-window chunking is shuffle-free") {
    val chunked = Chunking.slidingWindow(docs, "doc_id", "text", 4, 2)
    val shuffles = nodes(chunked).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"chunking should be per-row explode only, found ${shuffles.size} exchanges")
  }

  test("Z-order clustered layout plans exactly one (range) exchange") {
    val df = (0L until 100L).map(i => (i, i * 7 % 100)).toDF("x", "y")
    val shuffles = nodes(ZOrder.clustered(df, Seq("x", "y"), bits = 4))
      .collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 1,
      s"clustered write should pay ONE layout shuffle, found ${shuffles.size}")
    assert(shuffles.head.outputPartitioning.getClass.getSimpleName
      .contains("RangePartitioning"))
  }

  test("approx profile plans one aggregate pass with no Expand") {
    val profiled = Profiling.columnStats(docs, Seq("doc_id", "text"))
    val expands = nodes(profiled).collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e
    }
    assert(expands.isEmpty,
      "HLL profile must not multiply rows via Expand (that is the exact path)")
    val shuffles = nodes(profiled).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1,
      s"profile is one global aggregate, found ${shuffles.size} exchanges")
  }

  test("vocab encoding is a shuffle-free projection") {
    val vocab = Seq("doc" -> 0L, "number" -> 1L)
    val encoded = Vocab.encode(docs, "text", vocab)
    val shuffles = nodes(encoded).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"broadcast-map encode must not shuffle, found ${shuffles.size}")
  }

  test("hive-partitioned write prunes directories on a partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    ((0L until 200L).map(i => (i, s"t${i % 4}")))
      .toDF("id", "kind").write.mode("overwrite").partitionBy("kind").parquet(dir)
    val filtered = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("kind") === "t1")
    val scans = nodes(filtered).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the partition filter must reach the scan's partition pruning,
    // not run as a post-scan row filter over all 4 directories
    assert(scans.head.partitionFilters.nonEmpty,
      "kind = 't1' should prune partition directories at planning time")
    assert(filtered.count() == 50L)
  }

  test("ANN candidate joins stream int8 codes, never fp vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def checkCandidateJoin(df: DataFrame, what: String): Unit = {
      val joins = nodes(df).collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      def streamedOut(j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec) =
        (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
          j.left else j.right).output
      // the candidate join is the one streaming the packed code column
      val cand = joins.filter(j => streamedOut(j).exists(_.name == "_code"))
      assert(cand.nonEmpty, s"$what: no int8 candidate join found")
      cand.foreach { j =>
        val streamed = streamedOut(j)
        assert(streamed.exists(a =>
          a.name == "_code" && a.dataType == org.apache.spark.sql.types.BinaryType),
          s"$what: candidate payload is not binary codes")
        assert(!streamed.exists(_.dataType.isInstanceOf[
            org.apache.spark.sql.types.ArrayType]),
          s"$what: fp vector array leaked into the candidate-side payload: " +
            streamed.map(a => s"${a.name}:${a.dataType.simpleString}").mkString(", "))
      }
    }
    checkCandidateJoin(Similarity.ivfTopK(e, e.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3), "ivfTopK")
    checkCandidateJoin(Similarity.lshTopK(e, e.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3), "lshTopK")
  }

  test("NB cross joins broadcast the tiny aggregates, never corpus columns") {
    // a cross join MUST broadcast one side; the hints in NaiveBayes
    // pin it to the provably-tiny aggregates (class totals, priors,
    // vocab size). If a refactor drops a hint, the planner can pick
    // the corpus-derived side (doc ids / terms) at fixture scale —
    // the scale-cliff class the r7 verdict flagged on the LSH path.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", ($"doc_id" % 2 === 0).cast("string").as("lab"))
    val pred = NaiveBayes.trainPredict(
      docs.filter($"doc_id" % 5 =!= 0), docs.filter($"doc_id" % 5 === 0),
      "doc_id", "text", "lab")
    pred.write.format("noop").mode("overwrite").save() // finalize AQE
    val bnlj = nodes(pred).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnlj.nonEmpty, "expected cross joins in the NB plan")
    bnlj.foreach { j =>
      val build =
        (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
          j.right else j.left).output.map(_.name)
      assert(!build.exists(n => n == "doc_id" || n == "term"),
        s"corpus-derived side under a cross-join broadcast: $build")
    }
  }

  test("ANN candidate joins broadcast skinny probes, never fp vectors") {
    // the probe side is multiprobe-EXPLODED (#masks x queries), so a
    // vector there multiplies the broadcast by probes x vector width —
    // measured 300 MB / 15 s on a 16k-query self-graph. The bucket
    // join's BUILD side must carry only (query_id, bucket); the
    // vector attaches after, one per query, via a separate broadcast.
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for ((df, what) <- Seq(
        (Similarity.lshTopK(e, e, "vec_id", "embedding", k = 3), "lshTopK"),
        (Similarity.ivfTopK(e, e, "vec_id", "embedding", k = 3), "ivfTopK"))) {
      val joins = nodes(df).collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      def buildOut(j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec) =
        (if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight)
          j.right else j.left).output
      val bucketJoins = joins.filter(j =>
        j.leftKeys.exists(_.references.exists(r =>
          Seq("bucket", "list_id").contains(r.name))))
      assert(bucketJoins.nonEmpty, s"$what: no bucket-key candidate join")
      bucketJoins.foreach { j =>
        assert(!buildOut(j).exists(_.dataType.isInstanceOf[
            org.apache.spark.sql.types.ArrayType]),
          s"$what: fp vector array rides the probe broadcast: " +
            buildOut(j).map(a =>
              s"${a.name}:${a.dataType.simpleString}").mkString(", "))
      }
    }
  }

  test("spanStats scans the corpus text exactly once (cached occurrences)") {
    val tmp = java.nio.file.Files.createTempDirectory("planspan")
    docs.write.mode("overwrite").parquet(tmp.resolve("docs").toString)
    val fromDisk = spark.read.parquet(tmp.resolve("docs").toString)
    val st = DupSpans.spanStats(fromDisk, "doc_id", "text", k = 4)
    // the dup-count branch and the flag-back join both consume the
    // tokenize projection THROUGH the persisted occurrence rows: the
    // visible plan must read the cache (2+ InMemoryTableScans) and
    // contain no direct file scan — the single corpus read lives
    // inside the cached plan, executed once at materialization
    val ns = nodes(st)
    val fileScans = ns.count(_.nodeName.toLowerCase.startsWith("scan parquet"))
    val memScans = ns.count(_.nodeName.contains("InMemoryTableScan"))
    assert(fileScans == 0 && memScans >= 2,
      s"expected all corpus reads via the cached occurrences " +
        s"(got $fileScans file scans, $memScans cache scans)")
  }

  test("Scd.latest top-1-per-key plans a WindowGroupLimit (map-side prune)") {
    val events = (0L until 50L).map(i => (i % 5, i / 5, s"s$i"))
      .toDF("k", "seq", "status")
    val latest = Scd.latest(events, Seq("k"), Seq("seq"))
    assert(nodes(latest).exists(_.nodeName.contains("WindowGroupLimit")),
      "row_number()=1 should plan WindowGroupLimit so the exchange " +
        "carries ~one row per key")
  }

  test("C4 cleaning is a shuffle-free projection") {
    val flagged = Text.withC4Flags(docs, "text")
    assert(!nodes(flagged).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "withC4Flags must not shuffle")
  }

  test("LM scoring plans no cartesian; only the 1-row V scalar is nested-loop") {
    val scored = LmScore.scoreDocs(docs, "doc_id", "text")
    val ns = nodes(scored)
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
      "LmScore.scoreDocs plans a CartesianProduct")
    // the deliberate crossJoin of the single-row vocabulary-size
    // aggregate is the ONLY permissible nested-loop join
    assert(ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 1,
      "model joins (C12/C1) must be keyed hash joins, not nested loops")
  }

  test("BM25 broadcasts the query side; the corpus is never broadcast") {
    val scored = Bm25.topK(docs, "doc_id", "text",
      Seq(("q1", "doc number"), ("q2", "shared body")), k = 5)
    val ns = nodes(scored)
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
      "bm25 plans a CartesianProduct")
    // the two deliberate 1-row cross joins (corpus count N, and the
    // Σdl total feeding avgdl) are the ONLY permissible nested-loop
    // joins; the term match itself must be keyed
    assert(ns.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) <= 2,
      "bm25 term match must be a keyed join, not a nested loop")
    // the query side is broadcast (no shuffle of the tiny literal
    // relation feeds a sort-merge join)
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "expected broadcast joins on the query side")
  }

  test("self-kNN kernel path plans no join and no window at all") {
    val vecs = (0L until 30L).map(i =>
      (i, Seq.tabulate(4)(j => (i * j % 7).toFloat)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", org.apache.spark.sql.functions
        .col("embedding").cast("array<float>"))
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3,
      method = "brute")
    val ns = nodes(g)
    assert(!ns.exists(n => n.nodeName.toLowerCase.contains("join")),
      s"kernel self-kNN must not join: ${ns.map(_.nodeName).distinct}")
    assert(!ns.exists(n => n.nodeName.toLowerCase.contains("window")),
      "kernel self-kNN must not rank through a window")
  }

  private def withConf[T](key: String, value: String)(f: => T): T = {
    val old = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def fpVecAttrs(p: SparkPlan) = p.output.filter(a =>
    a.dataType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType) ||
    a.dataType == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, containsNull = false))

  // With auto-broadcast disabled, any BroadcastExchange in a plan can
  // only come from an explicit hint — so these pins distinguish
  // "hinted a corpus-sized table" (the 100 TB scale cliff) from "AQE
  // chose broadcast off a measured size" (fine).
  test("self-kNN LSH graph never broadcast-hints a corpus-derived table") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3,
        method = "lsh")
      val bad = nodes(g).collect { case b: BroadcastExchangeExec => b }
      assert(bad.isEmpty,
        s"self-graph LSH plan broadcasts a corpus-derived table " +
          s"(${bad.size} BroadcastExchange nodes) — at 100 TB this is " +
          "the scale cliff the bucketing exists to avoid")
      assertNoAllPairs(g, "knnGraph(lsh)")
    }
  }

  // The complementary pin to the one above: that test disables
  // auto-broadcast, so it only catches EXPLICIT broadcast hints.
  // This one leaves the default 10 MB threshold ON and feeds a
  // range-rooted corpus, whose size estimate stays rows×8 bytes
  // through every projection (no shuffle boundary below the joins →
  // AQE never corrects it). Without the SHUFFLE_HASH pins the static
  // planner broadcasts the float-vector corpus off that lying
  // estimate — measured: the ×10 clustered self-graph (160k × 512
  // floats) OOMed an 8 GB driver and the ×100 wall more than
  // doubled. The pins must hold for every lsh self-graph join.
  test("self-kNN LSH graph: a lying-estimate (range-rooted) corpus " +
      "is never statically broadcast") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.functions._
    val vecs = spark.range(0, 2048).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        j => sin(col("id") * 8 + j)).as("embedding"))
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3,
      method = "lsh")
    val bad = nodes(g).collect { case b: BroadcastExchangeExec => b }
    assert(bad.isEmpty,
      s"self-graph LSH plan statically broadcasts off a lying " +
        s"estimate (${bad.size} BroadcastExchange nodes) — on a real " +
        "corpus this is a corpus-sized driver broadcast build")
    // and the scale-path spelling (int8 probe flow) holds the same pin
    val sc8 = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding",
      k = 3, selfGraph = true, maxBucket = 64, int8Probe = true)
    val bad8 = nodes(sc8).collect { case b: BroadcastExchangeExec => b }
    assert(bad8.isEmpty,
      s"int8-probe scale path statically broadcasts off a lying " +
        s"estimate (${bad8.size} BroadcastExchange nodes)")
  }

  // Round-12 continuation: the same lying-estimate pin for the whole
  // self-join dedup family (found by graft.tools.AuditBroadcast —
  // minhash sig tables, shingle arrays, banded hamming rows, winnow
  // fp filters and float-vector sides all planned as static
  // broadcasts on a range-rooted corpus). Every op must plan ZERO
  // BroadcastExchange when its input's size estimate lies small.
  test("dedup self-join family: a lying-estimate (range-rooted) " +
      "corpus is never statically broadcast") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.functions._
    val rdocs = spark.range(0, 256).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), ((col("id") * 7 + j) % 97))): _*).as("text"))
    val remb = spark.range(0, 256).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        j => sin(col("id") * 16 + j)).as("embedding"))
    def assertNoBcast(name: String, df: DataFrame): Unit = {
      // the 1-row saturation-guard scalar is the one permitted
      // broadcast (a global aggregate — its cardinality is provable,
      // an estimate cannot lie about it). After the guard's isNull
      // filter pushes into the broadcast side its output prunes to
      // EMPTY; a corpus broadcast always carries join keys/columns,
      // so column-less or guard-only outputs are the guard shape
      val bad = nodes(df).collect { case b: BroadcastExchangeExec => b }
        .filterNot(b => b.output.isEmpty ||
          b.output.map(_.name) == Seq("_sat_guard"))
      assert(bad.isEmpty,
        s"$name statically broadcasts off a lying estimate " +
          s"(${bad.size} BroadcastExchange nodes) — corpus-sized " +
          "driver broadcast build at scale")
    }
    assertNoBcast("minhashCandidatePairs",
      Dedup.minhashCandidatePairs(rdocs, "doc_id", "text"))
    assertNoBcast("minhashCandidatePairs(star)",
      Dedup.minhashCandidatePairs(rdocs, "doc_id", "text",
        maxBucket = 4, overCap = "star"))
    assertNoBcast("ngramJaccardVerified",
      Dedup.ngramJaccardVerified(rdocs, "doc_id", "text",
        threshold = 0.8))
    assertNoBcast("simhashPairs",
      Dedup.simhashPairs(rdocs, "doc_id", "text", maxHamming = 3))
    assertNoBcast("winnowCandidatePairs",
      Dedup.winnowCandidatePairs(rdocs, "doc_id", "text"))
    assertNoBcast("embeddingCosinePairs",
      Dedup.embeddingCosinePairs(remb, "vec_id", "embedding",
        threshold = 0.3, planes = 4, probeBits = 1))
    assertNoBcast("embeddingCosinePairs(banded)",
      Dedup.embeddingCosinePairs(remb, "vec_id", "embedding",
        threshold = 0.3, planes = 4, probeBits = 1, tables = 2))
  }

  // Round-13 wave 2 (AuditBroadcast over every remaining join-bearing
  // op): the ops whose AQE-BLIND side — an expression-only subtree
  // with no exchange below, so no runtime stat ever corrects the
  // static choice — is ALWAYS corpus-derived (self-ops, or both-sides
  // -unbounded contracts). Pin rule unchanged: skinny rows
  // SHUFFLE_HASH, string/array/vector payload rows MERGE. Two-table
  // ops whose flagged side is bounded by contract (fuzzyMatch master
  // list, contamination bench, interval table) are documented in
  // PLANS.md instead — a pin there would forbid the legitimate
  // broadcast of a genuinely small side.
  test("wave-2 join family: lying-estimate corpora are never " +
      "statically broadcast") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.functions._
    val rdocs = spark.range(0, 256).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), ((col("id") * 7 + j) % 97))): _*).as("text"))
    val rdocs2 = spark.range(0, 256).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("v"), ((col("id") * 11 + j) % 89))): _*).as("text"))
    val remb = spark.range(0, 256).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        j => sin(col("id") * 16 + j)).as("embedding"))
    val revents = spark.range(0, 1024).select(
      col("id").as("event_id"), (col("id") % 63).as("user_id"),
      (col("id") * 1000000007L % 86400000000000L).as("ts"),
      concat(lit("t"), col("id") % 5).as("event_type"))
    // The assertion matches the adjudication criterion exactly: a
    // broadcast with a ShuffleExchange BELOW it is AQE-correctable
    // (the runtime re-plans from the measured stage — e.g. semDeDup's
    // final anti-join of the exchange-backed dropped-id set, Funnel's
    // per-step aggregates) and is allowed; a broadcast over an
    // expression-only subtree executes before any measurement exists
    // and must not appear.
    def assertNoBlindBcast(name: String, df: DataFrame): Unit = {
      val blind = nodes(df).collect {
        case b: BroadcastExchangeExec
            if !this.flatten(b).exists(_.isInstanceOf[
              org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
          => b
      }
      assert(blind.isEmpty,
        s"$name plans ${blind.size} AQE-BLIND broadcast(s) off a " +
          "lying estimate — corpus-sized driver broadcast at scale " +
          "with no runtime stat to correct it")
    }
    assertNoBlindBcast("selfFuzzyPairs",
      FuzzyJoin.selfFuzzyPairs(rdocs, "doc_id", "text", maxDistance = 2))
    assertNoBlindBcast("IncrementalDedup.cleaned",
      IncrementalDedup.cleaned(rdocs, rdocs2, "doc_id"))
    assertNoBlindBcast("IncrementalDedup.nearDupCleaned",
      IncrementalDedup.nearDupCleaned(rdocs, rdocs2, "doc_id", "text"))
    assertNoBlindBcast("semDeDup",
      Dedup.semDeDup(remb, "vec_id", "embedding", threshold = 0.9,
        nClusters = 4))
    assertNoBlindBcast("Funnel.depth",
      Funnel.depth(revents, "user_id", "ts", "event_type",
        Seq("t0", "t1", "t2")))
  }

  test("bounded-query lshTopK keeps its broadcast hints") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val topk = Similarity.lshTopK(vecs, vecs.filter($"vec_id" < 5),
        "vec_id", "embedding", k = 3)
      assert(nodes(topk).exists(_.isInstanceOf[BroadcastExchangeExec]),
        "bounded-query lshTopK should broadcast the query-derived " +
          "probe/vector tables")
    }
  }

  test("embedding pairs: no exchange ever carries two fp vectors; " +
      "the exploded probing side is int8-coded") {
    val emb = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val pairs = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.3, planes = 4, probeBits = 1)
      val exchanges = nodes(pairs).collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "expected shuffle exchanges in the plan")
      for (e <- exchanges)
        assert(fpVecAttrs(e).size <= 1,
          s"exchange carries ${fpVecAttrs(e).map(_.name)} — pair rows " +
            "must never ship both fp vectors")
      val codedSide = exchanges.filter(_.output.exists(_.name == "_code"))
      assert(codedSide.nonEmpty, "expected the int8-coded probing side")
      for (e <- codedSide)
        assert(fpVecAttrs(e).isEmpty,
          s"the probe-exploded side must stay int8-only, found " +
            s"${fpVecAttrs(e).map(_.name)}")
    }
  }

  test("embedding pairs star mode plans no all-pairs join") {
    val emb = (0L until 30L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")
    assertNoAllPairs(
      Dedup.embeddingCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.3, planes = 4, probeBits = 1,
        maxBucket = 3, overCap = "star"),
      "embeddingCosinePairs(star)")
  }

  test("fuzzy pairs plan keyed joins only — never a cartesian product") {
    val names = (0L until 60L).map(i => (i, s"name token$i suffix"))
      .toDF("id", "name")
    val pairs = FuzzyJoin.selfFuzzyPairs(names, "id", "name", 2,
      maxBlock = 10)
    assertNoAllPairs(pairs, "blocked fuzzy join")
  }

  test("incremental dedup's bloom-negative fast path is shuffle-free") {
    val ref = (0L until 50L).map(i => (i, s"k$i")).toDF("id", "k")
    val batch = (0L until 80L).map(i => (i, s"k${i * 3}")).toDF("id", "k")
    val cleaned = IncrementalDedup.cleaned(batch, ref, "k")
    // the union has two branches: the bloom-negative filter must not
    // shuffle batch rows; only the candidate anti-join may exchange.
    val shuffles = nodes(cleaned).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2,
      s"only the candidate verify join may shuffle, found ${shuffles.size}")
    val allPairs = nodes(cleaned).filter {
      case _: CartesianProductExec => true
      case _ => false
    }
    assert(allPairs.isEmpty)
  }

  // ------------------------------------------ TPC-H plan anchors

  private def tpch(name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")

  test("tpch q1: filter pushed to scan, partial+final agg, " +
      "one agg exchange") {
    val df = tpch("q_tpch_q1")
    val ns = nodes(df)
    val scans = ns.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // the shipdate predicate must reach the parquet reader as a
    // pushed filter (row-group pruning at scale), not a post-scan row
    // filter only
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
        .contains("LessThanOrEqual(l_shipdate")),
      scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString("; "))
    val aggs = ns.collect {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a }
    // partial (map-side combine) + final — the shuffle moves group
    // partials, never lineitem rows
    assert(aggs.size == 2, s"expected partial+final, got ${aggs.size}")
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, Final}
    assert(aggs.exists(_.aggregateExpressions.forall(_.mode == Partial)))
    assert(aggs.exists(_.aggregateExpressions.forall(_.mode == Final)))
    val shuffles = ns.collect { case e: ShuffleExchangeExec => e }
    // one agg boundary + the output ordering's range exchange
    assert(shuffles.size <= 2, s"found ${shuffles.size} exchanges")
  }

  test("tpch q19: disjunctive bracket pushes per-side implied " +
      "filters to BOTH scans") {
    // the OR-of-ANDs references both join sides, so the bracket as a
    // whole can't push below the join — but Catalyst must extract the
    // per-side implied disjunctions (quantity bands → lineitem scan,
    // brand+size bands → part scan) so neither table is read in full
    val df = tpch("q_tpch_q19")
    val scans = nodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    def pushed(table: String) = scans
      .filter(_.metadata.getOrElse("Location", "").contains(table))
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed("lineitem").contains("l_quantity"),
      s"quantity bands not pushed to lineitem: ${pushed("lineitem")}")
    assert(pushed("part").contains("p_brand") &&
      pushed("part").contains("p_size"),
      s"brand/size bands not pushed to part: ${pushed("part")}")
    assert(nodes(df).exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]))
  }

  test("tpch q18: semi-join (no IN collect), broadcast customer dim, " +
      "top-k via TakeOrderedAndProject") {
    val df = tpch("q_tpch_q18")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q18")
    // HAVING subquery planned as a left-semi JOIN against the
    // re-aggregated fact table — never an IN-list materialized on
    // the driver
    assert(ns.exists {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _ => false
    }, s"no semi-join in: ${ns.map(_.nodeName).distinct.mkString(", ")}")
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "customer dim should broadcast")
    // LIMIT 100 over the sort must plan per-partition heaps
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      s"no TakeOrderedAndProject in: ${ns.map(_.nodeName).distinct.mkString(", ")}")
  }

  test("percentile auto-crossover: selection only when few groups AND " +
      "huge per-group row counts; window otherwise — equal results") {
    // SharedSpark is local[4] (defaultParallelism 4): 2 groups are
    // below the parallelism bar; maxRowsPerTask shrunk to 10 stands
    // in for "more rows than one task should sort"
    val lowCard = (0L until 200L).map(i => (s"g${i % 2}", i.toDouble))
      .toDF("k", "v")
    val hiCard = (0L until 200L).map(i => (s"g${i % 40}", i.toDouble))
      .toDF("k", "v")
    val sel = Percentiles.exactInterpolatedAuto(lowCard, Seq("k"), "v",
      Seq("p50" -> 0.5), maxRowsPerTask = 10)
    assert(!nodes(sel).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "few huge groups must not window-sort the corpus into #groups tasks")
    // same shape, default threshold: 100 rows/group is single-task
    // trivial — the three-job selection harness must NOT be paid
    val winLow = Percentiles.exactInterpolatedAuto(lowCard, Seq("k"), "v",
      Seq("p50" -> 0.5))
    assert(nodes(winLow).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "small per-group rows take the window even at low cardinality")
    val win = Percentiles.exactInterpolatedAuto(hiCard, Seq("k"), "v",
      Seq("p50" -> 0.5), maxRowsPerTask = 10)
    assert(nodes(win).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "group count >= parallelism takes the window regardless of size")
    // the choice must be invisible in the results
    def vals(df: DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(vals(sel) == vals(Percentiles.exactInterpolated(lowCard,
      Seq("k"), "v", Seq("p50" -> 0.5))))
    assert(vals(win) == vals(Percentiles.exactInterpolatedBySelection(
      hiCard, Seq("k"), "v", Seq("p50" -> 0.5))))
  }

  test("tpch q2: correlated scalar subquery decorrelates to an " +
      "aggregate+join — no per-row subquery, no cartesian") {
    val df = tpch("q_tpch_q2")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q2")
    // decorrelation proof: the min-supply-cost subquery runs as a
    // grouped aggregate joined on the correlation key, so the
    // physical plan contains NO scalar-subquery expression anywhere
    // (an un-decorrelated plan would re-run the subquery per part)
    val hasScalarSubquery = ns.exists(_.expressions.exists(_.exists {
      case _: org.apache.spark.sql.execution.ScalarSubquery => true
      case _ => false
    }))
    assert(!hasScalarSubquery,
      "correlated scalar subquery survived to execution — decorrelation failed")
    assert(ns.count(_.isInstanceOf[
      org.apache.spark.sql.execution.aggregate.HashAggregateExec]) >= 2,
      "expected the decorrelated grouped-min aggregate in the plan")
    assert(ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "LIMIT 100 should plan per-partition heaps")
  }

  test("tpch q21: single-scan respell — one lineitem scan, no semi/anti") {
    // Round 14 respelled the EXISTS/NOT-EXISTS form (which scanned and
    // joined lineitem three times) as one lineitem pass: per-(order,
    // supplier) late counts, then both order-level counts in ONE
    // Window over the same exchange. The oracle keeps the EXISTS
    // spelling, so the hash gate proves equivalence; this pins the
    // single-scan shape so a refactor can't quietly reintroduce the
    // triple scan.
    val df = tpch("q_tpch_q21")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q21")
    val lineitemScans = ns.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains("lineitem")) => s
    }
    assert(lineitemScans.size == 1,
      s"expected exactly ONE lineitem scan, got ${lineitemScans.size}")
    val joinTypes = joinTypesOf(ns)
    assert(!joinTypes.contains(org.apache.spark.sql.catalyst.plans.LeftSemi) &&
      !joinTypes.contains(org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"semi/anti joins crept back into the single-scan respell: $joinTypes")
    assert(ns.count(_.isInstanceOf[
        org.apache.spark.sql.execution.window.WindowExec]) == 1,
      "both order-level counts must share one Window node")
  }

  private def joinTypesOf(ns: Seq[SparkPlan]) = ns.collect {
    case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.joinType
    case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.joinType
    case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.joinType
  }

  private def hasScalarSubquery(ns: Seq[SparkPlan]): Boolean =
    ns.exists(_.expressions.exists(_.exists {
      case _: org.apache.spark.sql.execution.ScalarSubquery => true
      case _ => false
    }))

  test("tpch q6: all three predicates reach the parquet scan") {
    val ns = nodes(tpch("q_tpch_q6"))
    val pushed = ns.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.metadata.getOrElse("PushedFilters", "")
    }.mkString("; ")
    // at 100 TB this query is scan bandwidth; a predicate that stays
    // above the reader gives up row-group pruning on that column
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed: $pushed")
  }

  test("tpch q8: dims broadcast; only the fact join + agg shuffle") {
    val df = tpch("q_tpch_q8")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q8")
    val bhj = ns.count(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(bhj >= 5, s"expected >=5 broadcast dim joins, got $bhj")
    val shuffles = ns.count(_.isInstanceOf[ShuffleExchangeExec])
    // lineitem ⋈ orders (2 exchanges) + the year agg boundary; the
    // seven dimension joins must not add exchanges
    assert(shuffles <= 3, s"found $shuffles exchanges — a dim join shuffled")
  }

  test("tpch q16: NOT IN plans a null-aware anti join, never a loop") {
    val df = tpch("q_tpch_q16")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q16")
    assert(joinTypesOf(ns).contains(
      org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"NOT IN must plan an anti join, got: ${joinTypesOf(ns)}")
  }

  test("tpch q17: correlated avg subquery decorrelates to a per-part " +
      "aggregate join — no per-row subquery") {
    val df = tpch("q_tpch_q17")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q17")
    assert(!hasScalarSubquery(ns),
      "correlated avg subquery survived to execution — decorrelation failed")
    assert(ns.count(_.isInstanceOf[
      org.apache.spark.sql.execution.aggregate.HashAggregateExec]) >= 2,
      "expected the decorrelated per-part avg aggregate in the plan")
  }

  test("tpch q20: nested IN + correlated scalar all decorrelate") {
    val df = tpch("q_tpch_q20")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q20")
    assert(!hasScalarSubquery(ns),
      "correlated per-part total survived as a scalar subquery")
    assert(joinTypesOf(ns).count(
      _ == org.apache.spark.sql.catalyst.plans.LeftSemi) >= 2,
      s"expected both IN levels as semi joins, got: ${joinTypesOf(ns)}")
  }

  test("tpch q22: NOT EXISTS anti-joins; the global avg runs once") {
    val df = tpch("q_tpch_q22")
    val ns = nodes(df)
    assertNoAllPairs(df, "tpch q22")
    assert(joinTypesOf(ns).contains(
      org.apache.spark.sql.catalyst.plans.LeftAnti),
      s"NOT EXISTS must plan a left-anti join, got: ${joinTypesOf(ns)}")
    // the uncorrelated avg is ALLOWED to stay a ScalarSubquery — it
    // executes exactly once; the pin is that the anti join and the
    // scalar gate never degrade to a nested loop (assertNoAllPairs)
  }

  test("tpch q15: CTE max runs as a one-shot scalar, no cartesian") {
    val df = tpch("q_tpch_q15")
    assertNoAllPairs(df, "tpch q15")
  }

  test("tpch q11: HAVING-against-subquery keeps a single agg pipeline") {
    val df = tpch("q_tpch_q11")
    assertNoAllPairs(df, "tpch q11")
    val ns = nodes(df)
    assert(ns.count(_.isInstanceOf[
      org.apache.spark.sql.execution.aggregate.HashAggregateExec]) >= 2,
      "expected per-part and threshold aggregates")
  }

  test("imageHashPairs plans a banded join — never all-pairs") {
    val img = Multimodal.encodePng(Multimodal.PngImage(12, 10, 1,
      Array.tabulate(120)(i => (i * 7 % 256).toByte)))
    val df = (0L until 6L).map(i => (i, img)).toDF("doc_id", "payload")
    assertNoAllPairs(
      Dedup.imageHashPairs(df, "doc_id", "payload"),
      "imageHashPairs")
  }

  test("audioHashPairs plans a banded join — never all-pairs") {
    val wav = Audio.encodeWav(Audio.WavClip(8000, 1,
      Audio.triangleSamples(256, 29, 500)))
    val df = (0L until 6L).map(i => (i, wav)).toDF("doc_id", "payload")
    assertNoAllPairs(
      Dedup.audioHashPairs(df, "doc_id", "payload"),
      "audioHashPairs")
  }

  test("shuffle_shard: one hash exchange + one window (the final " +
      "range exchange is only the oracle's ORDER BY)") {
    val df = tpch("q_shuffle_shard")
    val ns = nodes(df)
    val shuffles = ns.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 2, s"expected shard-hash + orderBy range " +
      s"exchanges only, got ${shuffles.size}")
    val windows = ns.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 1)
  }

  test("pack_greedy: one shard-hash exchange + the oracle's ORDER BY " +
      "range exchange — the greedy scan itself never shuffles") {
    val df = tpch("q_pack_greedy")
    val shuffles = nodes(df).collect { case e: ShuffleExchangeExec => e }
    // 3 = the fixture's tBalanced round-robin + the shard hash
    // repartition + the oracle's ORDER BY range exchange; the greedy
    // scan contributes the hash one only
    assert(shuffles.size == 3,
      s"expected balance + shard repartition + orderBy only, got ${shuffles.size}")
  }

  test("split_safe: fingerprint pair generation is star edges via " +
      "group-min — never an all-pairs self join") {
    assertNoAllPairs(tpch("q_split_safe"), "q_split_safe")
  }

  test("bounded recall gates: the exact side is a broadcast sample, " +
      "never a CartesianProduct") {
    // These three gates used to cross-join the embedding table with
    // itself (O(n²) — fine at sf0.1, a suite-killer at 100×). The
    // bounded spelling broadcasts a ≤512-row md5 sample against the
    // full table: the plan must show BroadcastNestedLoopJoin (the
    // 512·n linear scan) and no CartesianProductExec anywhere —
    // including under semDeDup / embeddingCosinePairs subtrees.
    for (q <- Seq("dedup_embedding_pairs", "dedup_emb_lsh_recall",
        "dedup_semantic_recall")) {
      val df = tpch(q)
      val ns = nodes(df)
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q plans a CartesianProduct")
      assert(ns.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        s"$q lost its broadcast-sample join shape")
    }
  }

  test("dpp: the attribute-filtered dim join injects dynamic partition " +
      "pruning into the partitioned fact scan") {
    // q_dpp_prune's premise: is_peak lives only on the dim, so STATIC
    // pruning is impossible — the scan must carry a runtime
    // DynamicPruningExpression fed by the broadcast dim, or at 100 TB
    // the query reads every year partition
    val df = tpch("q_dpp_prune")
    val scans = nodes(df).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty)
    val dynamic = scans.exists(_.partitionFilters.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression => true
      case _ => false
    }))
    assert(dynamic, "no DynamicPruningExpression on the fact scan's " +
      s"partition filters: ${scans.map(_.partitionFilters).mkString("; ")}")
    // and the dim must not force a shuffle onto the fact side
    assertNoAllPairs(df, "dpp join")
  }

  test("runtime bloom filter: a selective dim shuffle-join seeds a " +
      "might_contain gate on the fact scan side") {
    // Row-level runtime filtering is the shuffle-join sibling of DPP:
    // when the fact side is too big to broadcast-join and not
    // partitioned on the key, the selective dim side can still seed a
    // bloom filter that drops fact rows BEFORE the join exchange.
    // Thresholds are sized for 100 TB defaults (10 GiB application
    // side) — this pin drives a session with test-sized thresholds to
    // prove the engine's session/extensions wiring leaves the feature
    // functional (a custom rule or conf clobber would silence it).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dir = java.nio.file.Files.createTempDirectory("bloomtest")
    import org.apache.spark.sql.functions._
    spark.range(0, 10000).select(col("id").as("fk"),
      (col("id") % 97).as("payload"))
      .write.mode("overwrite").parquet(dir.resolve("fact").toString)
    spark.range(0, 1000).select(col("id").as("pk"),
      (col("id") % 7).as("attr"))
      .write.mode("overwrite").parquet(dir.resolve("dim").toString)
    val fact = s2.read.parquet(dir.resolve("fact").toString)
    val dim = s2.read.parquet(dir.resolve("dim").toString)
      .filter(col("attr") === 3)
    val joined = fact.join(dim, col("fk") === col("pk"))
    val hasBloom = nodes(joined).exists(_.expressions.exists(_.exists(
      e => e.getClass.getSimpleName == "BloomFilterMightContain" ||
        e.prettyName == "might_contain")))
    assert(hasBloom,
      "no bloom might_contain on the fact side — runtime row filtering is wired off")
  }

  test("eager localCheckpoint preserves hash partitioning — the " +
      "triangles closing side pays ONE exchange across wedge batches") {
    // The mechanism Graph.triangles' shared closing side relies on:
    // a repartition(n, keys) + DISK_ONLY persist must carry its
    // HashPartitioning through the InMemoryRelation, so a later
    // equi-join on those keys adds NO exchange on that side. (An
    // eager localCheckpoint does NOT preserve partitioning on this
    // build — measured here first: LogicalRDD reports unknown
    // partitioning and the join re-shuffles — which is why triangles
    // persists the repartitioned closing frame instead.) If a Spark
    // upgrade drops partitioning through InMemoryRelation, every
    // wedge batch silently re-shuffles the full edge list.
    import org.apache.spark.sql.functions.{col, lit}
    val chk = spark.range(0, 1000)
      .select(col("id").as("v1"), (col("id") % 7).as("v2"))
      .repartition(8, col("v1"), col("v2"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      chk.count() // materialize, as triangles does
      val probe = spark.range(0, 100)
        .select(col("id").as("v1"), (col("id") % 7).as("v2"),
          lit(1).as("x"))
      val joined = probe.join(chk.hint("SHUFFLE_HASH"), Seq("v1", "v2"))
      val shuffles = nodes(joined).collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1,
        s"expected the probe-side exchange only, got ${shuffles.size} — " +
          "the persisted side lost its partitioning")
    } finally chk.unpersist(false)
  }

  test("dsir mixture: one tokenize-explode per target, shared window " +
      "totals, broadcast model, no cross join") {
    // K target fits must join the raw bucket GRID as ≤buckets-row
    // aggregates — never rescan the target corpus for its total
    // (the total rides the fit as a global-window sum) and never
    // attach totals via 1-row cross joins.
    def mix(k: Int): DataFrame = {
      val raw = (0L until 50L).map(i => (i, s"alpha beta w$i"))
        .toDF("doc_id", "text")
      val ts = (1 to k).map(j => ((0L until 10L)
        .map(i => (i, s"alpha t$j")).toDF("doc_id", "text"), j.toDouble))
      Dsir.scoreDocsMix(raw, ts, "doc_id", "text", buckets = 64)
    }
    assertNoAllPairs(mix(3), "scoreDocsMix")
    def generates(df: DataFrame): Int = nodes(df)
      .count(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
    // raw contributes 2 (per-doc scoring rows + the bucket fit; one
    // exchange at runtime via ReusedExchange), each target exactly 1
    assert(generates(mix(1)) == 3,
      s"K=1 expected 3 tokenize-explodes, got ${generates(mix(1))}")
    assert(generates(mix(3)) == 5,
      s"K=3 expected 5 tokenize-explodes (+1 per target, never +2), " +
        s"got ${generates(mix(3))}")
    // the ≤buckets-row model broadcasts under the scoring join
    assert(nodes(mix(3)).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "the scoring model join lost its broadcast")
  }

  test("bpe encode: broadcast merge table + per-row kernel — zero " +
      "shuffles, zero joins") {
    val docs = (0L until 20L).map(i => (i, s"the then there t$i"))
      .toDF("doc_id", "text")
    val df = Bpe.encode(docs, "text", Seq(("t", "h"), ("th", "e")),
      out = "tokens")
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "bpe encode introduced a shuffle")
    assert(!ns.exists(_.nodeName.contains("Join")),
      "bpe encode introduced a join — the merge table must ship in " +
        "the expression, not as a joined table")
  }

  test("url psl: registered-domain extraction is a pure expression — " +
      "zero shuffles, zero joins") {
    val urls = (0L until 20L).map(i => (i, s"https://a$i.example.co.uk/p"))
      .toDF("doc_id", "url")
    val df = Urls.parseUrls(urls, "url")
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "url parse introduced a shuffle")
    assert(!ns.exists(_.nodeName.contains("Join")),
      "url parse introduced a join — the PSL rule table must ship in " +
        "the expression, not as a joined table")
  }

  test("knnGraph scale mode: no float query vector crosses a bucket " +
      "join (int8 probe flow)") {
    // The regression this pin prevents: attaching the float query
    // vector to the candidate stream by a bucket/query_id join — at
    // the ×100 clustered fixture that shuffled ~1B rows × ~100 B
    // (≈100 GB, filled the box). Scale mode must carry only the
    // 64-byte int8 codes through the bucket join.
    import org.apache.spark.sql.execution.joins.{
      BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val vecs = (0L until 300L).map(i =>
      (i, Array.tabulate(8)(j => math.cos(i * 2.7 + j))))
      .toDF("vec_id", "embedding")
    val df = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding", k = 3,
      planes = 5, probeBits = 2, rerank = 16, selfGraph = true,
      maxBucket = 1000, int8Probe = true)
    val joins = nodes(df).collect {
      case j: SortMergeJoinExec =>
        (j.leftKeys ++ j.rightKeys, j.left.output ++ j.right.output)
      case j: ShuffledHashJoinExec =>
        (j.leftKeys ++ j.rightKeys, j.left.output ++ j.right.output)
      case j: BroadcastHashJoinExec =>
        (j.leftKeys ++ j.rightKeys, j.left.output ++ j.right.output)
    }
    val bucketJoins = joins.filter(
      _._1.exists(_.references.exists(_.name == "bucket")))
    assert(bucketJoins.nonEmpty, "expected bucket-keyed candidate joins")
    val floatArr: org.apache.spark.sql.types.DataType => Boolean = {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    for ((_, out) <- bucketJoins)
      assert(!out.exists(a => a.name == "v_q" && floatArr(a.dataType)),
        "the float query vector crosses a bucket join — the int8 " +
          "probe flow regressed")
    assert(bucketJoins.exists { case (_, out) =>
      out.exists(_.name == "_q8") && out.exists(_.name == "_c8") },
      "no int8×int8 bucket scoring join found")
  }
}
