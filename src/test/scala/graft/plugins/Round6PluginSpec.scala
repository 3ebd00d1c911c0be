package graft.plugins

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.{Config, Loader, Pipeline}
import graft.plugins.transform._

/** Round-6 plugins: the round-5 operator families exposed to TOML
  * configs (the reference's model — everything reachable from config,
  * ref config.py:24-29) — dup_spans, tfidf, scd2, graph, and the
  * sample plugin's weighted method. Each gets execute + dry-run
  * checks and a config-driven end-to-end run. */
class Round6PluginSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._
  private val dir = Paths.get("/tmp")

  private val docs = Seq(
    (0L, "a b c d e f g h unique zero tail"),
    (1L, "a b c d e f g h other one ending"),
    (2L, "totally different words in this document here now extra")
  ).toDF("doc_id", "text")

  test("hash_embed plugin: empty-text rows keep flowing with a NULL " +
      "embedding (the dryRun nullable-append contract)") {
    val withEmpty = docs.unionByName(
      Seq((3L, ""), (4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val plug = new HashEmbedPlugin(
      Map("id_column" -> "doc_id", "dim" -> 8), dir, "default")
    val out = plug.execute(withEmpty).fold(e => fail(e.getMessage), identity)
    assert(out.count() == 5) // no silent row drop
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).isNullAt(2) && byId(4L).isNullAt(2))
    assert(!byId(0L).isNullAt(2))
    val dry = plug.dryRun(withEmpty.schema).fold(e => fail(e.getMessage),
      identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
  }

  // ------------------------------------------------------------ dup_spans

  test("dup_spans plugin: stats and filter modes, dry-run schemas") {
    val stats = new DupSpansPlugin(
      Map("id_column" -> "doc_id", "k" -> 8), dir, "default")
    val st = stats.execute(docs).fold(e => fail(e.getMessage), identity)
    assert(st.columns.toSeq == Seq("doc_id", "n_tokens", "n_grams",
      "n_dup_grams", "covered_tokens", "dup_gram_ratio", "coverage_ratio"))
    val byId = st.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(3) == 1L && byId(2L).getLong(3) == 0L)
    // dry-run matches execute's names and types without running a job
    val dry = stats.dryRun(docs.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fields.map(f => (f.name, f.dataType)).toSeq
      == st.schema.fields.map(f => (f.name, f.dataType)).toSeq)

    val gate = new DupSpansPlugin(Map("id_column" -> "doc_id", "k" -> 8,
      "mode" -> "filter", "max_coverage" -> 0.5), dir, "default")
    val kept = gate.execute(docs).fold(e => fail(e.getMessage), identity)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(gate.dryRun(docs.schema).toOption.get == docs.schema)

    assert(new DupSpansPlugin(Map("id_column" -> "doc_id", "mode" -> "filter"),
      dir, "default").execute(docs).left.toOption.get.getMessage
      .contains("'max_coverage' is required"))
    assert(stats.dryRun(StructType(Seq(StructField("doc_id", LongType))))
      .left.toOption.get.getMessage.contains("Column 'text' not found"))
  }

  // ---------------------------------------------------------------- tfidf

  test("tfidf plugin: top-k terms, dry-run schema") {
    val tf = Seq((0L, "apple apple banana"), (1L, "banana cherry"))
      .toDF("doc_id", "text")
    val plug = new TfidfPlugin(Map("id_column" -> "doc_id", "k" -> 1),
      dir, "default")
    val top = plug.execute(tf).fold(e => fail(e.getMessage), identity)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top(0L) == "apple") // tf=2 df=1 dominates
    val dry = plug.dryRun(tf.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq
      == Seq("doc_id", "rank", "term", "tf", "df", "tfidf"))
    assert(plug.dryRun(StructType(Seq(StructField("x", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
  }

  // ----------------------------------------------------------------- scd2

  private val events = Seq(
    (1L, "O", "2024-01-01", 10L),
    (1L, "F", "2024-02-01", 11L),
    (1L, "O", "2024-03-01", 12L)
  ).toDF("k", "status", "dt", "id")
    .withColumn("dt", org.apache.spark.sql.functions.to_date(
      org.apache.spark.sql.functions.col("dt")))

  test("scd2 plugin: build, as_of lookup, dry-run column checks") {
    val base = Map[String, Any]("key_columns" -> Seq("k"),
      "attr_columns" -> Seq("status"), "order_columns" -> Seq("dt", "id"),
      "valid_from_column" -> "dt")
    val plug = new ScdPlugin(base, dir, "default")
    val out = plug.execute(events).fold(e => fail(e.getMessage), identity)
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "version", "status",
      "valid_from", "valid_to", "is_current", "n_events"))

    val at = new ScdPlugin(base + ("as_of" -> "2024-02-15"), dir, "default")
      .execute(events).fold(e => fail(e.getMessage), identity).collect()
    assert(at.length == 1 && at(0).getAs[String]("status") == "F")

    val dry = plug.dryRun(events.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.dryRun(StructType(Seq(StructField("k", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
  }

  // ---------------------------------------------------------------- graph

  test("graph plugin: pagerank and degrees, static dry-run schemas") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("b", "a"), ("c", "b"), ("a", "c")).toDF("src", "dst")
    val pr = new GraphPlugin(Map("method" -> "pagerank",
      "src_column" -> "src", "dst_column" -> "dst", "iterations" -> 3),
      dir, "default")
    val ranks = pr.execute(edges).fold(e => fail(e.getMessage), identity)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-12)
    val dry = pr.dryRun(edges.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == Seq("node", "rank"))
    assert(dry("rank").dataType == DoubleType)

    val deg = new GraphPlugin(Map("method" -> "degrees",
      "src_column" -> "src", "dst_column" -> "dst"), dir, "default")
    val d = deg.execute(edges).fold(e => fail(e.getMessage), identity)
    assert(d.columns.toSeq == Seq("node", "out_degree", "in_degree", "degree"))
    assert(deg.dryRun(edges.schema).toOption.get.fieldNames.toSeq
      == d.columns.toSeq)

    // src/dst type mismatch caught at dry-run time
    val bad = StructType(Seq(StructField("src", StringType),
      StructField("dst", LongType)))
    assert(pr.dryRun(bad).left.toOption.get.getMessage
      .contains("must share a type"))
  }

  // ------------------------------------------------------- sample weighted

  test("sample plugin: weighted method via config options") {
    val rows = (1L to 100L).map(i => (i, if (i <= 50) 1.0 else 50.0))
      .toDF("id", "w")
    val plug = new SamplePlugin(Map("method" -> "weighted",
      "key_column" -> "id", "weight_column" -> "w", "k" -> 10),
      dir, "default")
    val s = plug.execute(rows).fold(e => fail(e.getMessage), identity)
      .select("id").as[Long].collect()
    assert(s.length == 10 && s.count(_ > 50L) >= 8)
    assert(plug.dryRun(rows.schema).toOption.get.fieldNames.toSeq
      == rows.schema.fieldNames.toSeq)
    assert(new SamplePlugin(Map("method" -> "weighted", "key_column" -> "id"),
      dir, "default").execute(rows).left.toOption.get.getMessage
      .contains("'weight_column' is required"))
  }

  // --------------------------------------------- round-6 second wave

  test("c4_filter plugin: filter and flags modes, dry-run schema") {
    val pages = Seq(
      (0L, "First good sentence carries the needed words.\n" +
        "Second good sentence carries the needed words.\n" +
        "Third good sentence carries the needed words."),
      (1L, "no sentences here at all")
    ).toDF("doc_id", "text")
    val filt = new C4Plugin(Map.empty, dir, "default")
    val kept = filt.execute(pages).fold(e => fail(e.getMessage), identity)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(0L))
    assert(filt.dryRun(pages.schema).toOption.get.fieldNames.toSeq
      == pages.schema.fieldNames.toSeq)
    val flags = new C4Plugin(Map("mode" -> "flags"), dir, "default")
    assert(flags.dryRun(pages.schema).toOption.get.fieldNames.toSeq
      == Seq("doc_id", "text", "clean_text", "n_lines", "n_lines_kept",
        "n_sentences", "c4_pass"))
  }

  test("lm_score plugin: score and filter modes, dry-run schemas") {
    val docsLm = Seq((0L, "a b a b"), (1L, "a b"), (2L, "z q"))
      .toDF("doc_id", "text")
    val score = new LmScorePlugin(Map("id_column" -> "doc_id"), dir, "default")
    val out = score.execute(docsLm).fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("doc_id", "n_bigrams", "avg_logprob"))
    assert(out.count() == 3)
    assert(score.dryRun(docsLm.schema).toOption.get
      .fields.map(f => (f.name, f.dataType)).toSeq
      == out.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val filt = new LmScorePlugin(Map("id_column" -> "doc_id",
      "mode" -> "filter", "min_avg_logprob" -> -1.0), dir, "default")
    assert(filt.dryRun(docsLm.schema).toOption.get == docsLm.schema)
    assert(new LmScorePlugin(Map("id_column" -> "doc_id", "mode" -> "filter"),
      dir, "default").execute(docsLm).left.toOption.get.getMessage
      .contains("'min_avg_logprob' is required"))
  }

  test("graph plugin: components method labels by min member") {
    val edges = Seq((5L, 3L), (3L, 1L), (8L, 9L)).toDF("src", "dst")
    val plug = new GraphPlugin(Map("method" -> "components",
      "src_column" -> "src", "dst_column" -> "dst"), dir, "default")
    val labels = plug.execute(edges).fold(e => fail(e.getMessage), identity)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 3L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
    assert(plug.dryRun(edges.schema).toOption.get.fieldNames.toSeq
      == Seq("node", "cluster_id"))
  }

  test("scd2 plugin: latest mode keeps one row per key, schema intact") {
    val plug = new ScdPlugin(Map[String, Any]("mode" -> "latest",
      "key_columns" -> Seq("k"), "order_columns" -> Seq("dt", "id")),
      dir, "default")
    val out = plug.execute(events).fold(e => fail(e.getMessage), identity)
    assert(out.count() == 1)
    assert(out.collect()(0).getAs[String]("status") == "O") // latest event
    assert(plug.dryRun(events.schema).toOption.get == events.schema)
  }

  test("orc plugins: roundtrip preserves values; dry_run = footer schema") {
    val tmp = Files.createTempDirectory("r6orc")
    val data = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    val outP = tmp.resolve("t.orc").toString
    new graft.plugins.output.OrcWriterPlugin(
      Map("output_path" -> outP, "compression" -> "zstd"), tmp, "default")
      .execute(data).fold(e => fail(e.getMessage), _ => ())
    val scan = new graft.plugins.input.OrcScanPlugin(
      Map("input_path" -> outP), tmp, "default")
    val back = scan.execute().fold(e => fail(e.getMessage), identity)
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq
      == data.orderBy("k").collect().map(_.toSeq).toSeq)
    assert(scan.dryRun().toOption.get.fieldNames.toSeq == Seq("k", "s", "v"))
  }

  test("similarity plugin: pca_project method appends the component column") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq((i - 10).toFloat, (10 - i).toFloat, 0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
    val plug = new SimilarityPlugin(Map("method" -> "pca_project",
      "k" -> 2, "output_column" -> "pc"), dir, "default")
    val out = plug.executeWith(vecs, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("vec_id", "embedding", "pc"))
    assert(out.select("pc").collect().forall(_.getSeq[Double](0).length == 2))
    val dry = plug.dryRunWith(vecs.schema, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.dryRunWith(StructType(Seq(StructField("x", LongType))),
      Map.empty).left.toOption.get.getMessage.contains("not found"))
  }

  test("bm25 plugin: per-query top-k with scores; dry-run static schema") {
    val plug = new Bm25Plugin(Map("id_column" -> "doc_id",
      "queries" -> Map("qa" -> "unique zero", "qb" -> "different words"),
      "k" -> 5), dir, "default")
    val out = plug.execute(docs).fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("query_id", "rank", "doc_id", "score"))
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // qa's terms only hit doc 0; qb's only doc 2
    assert(rows.filter(_._1 == "qa").map(_._3).toSeq == Seq(0L))
    assert(rows.filter(_._1 == "qb").map(_._3).toSeq == Seq(2L))
    val dry = plug.dryRun(docs.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(dry("doc_id").dataType == LongType)
    assert(plug.dryRun(StructType(Seq(StructField("x", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
    assert(new Bm25Plugin(Map("id_column" -> "doc_id"), dir, "default")
      .execute(docs).isLeft) // queries required
  }

  test("bm25 plugin: queries_label stream replaces the inline table") {
    val queries = Seq(("qa", "unique zero"), ("qb", "different words"))
      .toDF("query_id", "query_text")
    val plug = new Bm25Plugin(Map("id_column" -> "doc_id",
      "queries_label" -> "probes", "k" -> 3), dir, "default")
    val out = plug.executeWith(docs, Map("probes" -> Right(queries)))
      .fold(e => fail(e.getMessage), identity)
    val hits = out.collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(hits == Set(("qa", 0L), ("qb", 2L)))
    val dry = plug.dryRunWith(docs.schema,
        Map("probes" -> Right(queries.schema)))
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.executeWith(docs, Map.empty).isLeft) // missing label
    // a mislabeled BIG query table must fail the driver-collect cap
    // with an actionable error, not OOM the driver
    val capped = new Bm25Plugin(Map("id_column" -> "doc_id",
      "queries_label" -> "probes", "max_queries" -> 1), dir, "default")
      .executeWith(docs, Map("probes" -> Right(queries)))
    assert(capped.left.toOption.get.getMessage.contains("max_queries"))
  }

  test("top_ngrams plugin: frequency-ranked grams; dry-run static schema") {
    val plug = new NgramsPlugin(Map("id_column" -> "doc_id", "n" -> 2,
      "k" -> 5), dir, "default")
    val out = plug.execute(docs).fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("rank", "ngram", "n_occurrences",
      "n_docs"))
    val top = out.collect()
    assert(top.length == 5)
    // "a b" .. "g h" appear in docs 0 and 1
    assert(top(0).getLong(2) == 2L && top(0).getLong(3) == 2L)
    val dry = plug.dryRun(docs.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.dryRun(StructType(Seq(StructField("x", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
  }

  test("percentiles plugin: band method trims by per-group percent rank") {
    val vals = (1 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
    val plug = new PercentilesPlugin(Map("method" -> "band",
      "group_by" -> Seq("grp"), "value_column" -> "v",
      "band_lo" -> 0.2, "band_hi" -> 0.8), dir, "default")
    val out = plug.execute(vals).fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("grp", "v", "pct_rank"))
    assert(out.collect().map(_.getLong(1)).sorted.toSeq == (3L to 8L))
    val dry = plug.dryRun(vals.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    // band_lo/band_hi required for the band method
    assert(new PercentilesPlugin(Map("method" -> "band",
      "group_by" -> Seq("grp"), "value_column" -> "v"), dir, "default")
      .execute(vals).isLeft)
    // the classic methods still work untouched
    val classic = new PercentilesPlugin(Map(
      "group_by" -> Seq("grp"), "value_column" -> "v",
      "percentiles" -> Seq(0.5)), dir, "default")
    assert(classic.execute(vals).fold(e => fail(e.getMessage), identity)
      .collect()(0).getDouble(1) == 5.5)
  }

  test("similarity plugin: knn_graph and knn_components methods") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
    val graph = new SimilarityPlugin(Map("method" -> "knn_graph",
      "id_column" -> "vec_id", "knn_method" -> "brute", "k" -> 1,
      "min_cosine" -> 0.9), dir, "default")
    val g = graph.executeWith(vecs, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(g.columns.toSeq == Seq("query_id", "neighbor_id", "cosine",
      "rank"))
    val edges = g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)))
    val gdry = graph.dryRunWith(vecs.schema, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(gdry.fieldNames.toSeq == g.columns.toSeq)
    // the brute cap's escape hatch is reachable from config
    val capped = new SimilarityPlugin(Map("method" -> "knn_graph",
      "id_column" -> "vec_id", "knn_method" -> "brute", "k" -> 1,
      "max_brute" -> 2), dir, "default")
      .executeWith(vecs, Map.empty)
    assert(capped.left.toOption.get.getMessage.contains("lsh"))
    val comp = new SimilarityPlugin(Map("method" -> "knn_components",
      "id_column" -> "vec_id", "knn_method" -> "brute", "k" -> 1,
      "min_cosine" -> 0.9), dir, "default")
    val c = comp.executeWith(vecs, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(c.columns.toSeq == Seq("vec_id", "cluster_id"))
    val byId = c.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    val cdry = comp.dryRunWith(vecs.schema, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(cdry.fieldNames.toSeq == c.columns.toSeq)
    assert(comp.dryRunWith(StructType(Seq(StructField("x", LongType))),
      Map.empty).isLeft)
  }

  test("fuzzy_pairs plugin: blocked levenshtein pairs; dry-run schema") {
    val names = Seq((1L, "blue bolt"), (2L, "blue belt"), (3L, "red gear"))
      .toDF("id", "name")
    val plug = new FuzzyPairsPlugin(Map("id_column" -> "id",
      "string_column" -> "name", "max_distance" -> 1), dir, "default")
    val out = plug.execute(names).fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "s_a", "s_b",
      "distance"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
    val dry = plug.dryRun(names.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(dry("id_a").dataType == LongType)
    assert(plug.dryRun(StructType(Seq(StructField("id", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
  }

  test("interval_join plugin: custom-operator join via labeled streams") {
    val points = Seq((1L, 5L), (2L, 50L)).toDF("pid", "p")
    val bands = Seq((10L, 0L, 9L), (20L, 40L, 60L)).toDF("iid", "lo", "hi")
    val plug = new IntervalJoinPlugin(Map("point_column" -> "p",
      "lo_column" -> "lo", "hi_column" -> "hi",
      "intervals_label" -> "bands"), dir, "default")
    val out = plug.executeWith(points, Map("bands" -> Right(bands)))
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("pid", "p", "iid", "lo", "hi"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 10L), (2L, 20L)))
    assert(out.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    val dry = plug.dryRunWith(points.schema,
        Map("bands" -> Right(bands.schema)))
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.dryRunWith(points.schema, Map.empty).isLeft)
  }

  test("sessionize plugin: session_window method (native operator, " +
      "no tie column; end = last event + gap)") {
    val ev = Seq((1L, 0L, 1.0), (1L, 1000L * 1000000000, 2.0),
        (1L, 5000L * 1000000000L, 3.0))
      .toDF("user_id", "ts", "value")
    val plug = new SessionizePlugin(Map("method" -> "session_window",
      "user_column" -> "user_id", "ts_column" -> "ts",
      "value_column" -> "value", "gap_seconds" -> 1800), dir, "default")
    val out = plug.execute(ev).fold(e => fail(e.getMessage), identity)
    val rows = out.orderBy("session_start").collect()
    assert(rows.length == 2)
    // first session: events at 0s and 1000s merge (gap 1800s);
    // end = 1000s + 1800s gap, in epoch nanos
    assert(rows(0).getAs[Long]("session_start") == 0L)
    assert(rows(0).getAs[Long]("session_end") == 2800L * 1000000000L)
    assert(rows(0).getAs[Long]("n_events") == 2L)
    assert(rows(1).getAs[Long]("n_events") == 1L)
    val dry = plug.dryRun(ev.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    // islands still demands the tie column; session_window does not
    assert(new SessionizePlugin(Map("user_column" -> "user_id",
      "ts_column" -> "ts", "value_column" -> "value"), dir, "default")
      .dryRun(ev.schema).left.toOption.get.getMessage
      .contains("'tie_column' is required"))
    assert(new SessionizePlugin(Map("method" -> "magic",
      "user_column" -> "user_id", "ts_column" -> "ts",
      "value_column" -> "value"), dir, "default")
      .execute(ev).left.toOption.get.getMessage
      .contains("Unknown sessionize method"))
  }

  test("sessionize session_window: ts_unit declares an integral " +
      "column's epoch unit (micros == same instants as nanos)") {
    val evMicros = Seq((1L, 0L, 1.0), (1L, 1000L * 1000000L, 2.0),
        (1L, 5000L * 1000000L, 3.0))
      .toDF("user_id", "ts", "value")
    val plug = new SessionizePlugin(Map("method" -> "session_window",
      "user_column" -> "user_id", "ts_column" -> "ts",
      "value_column" -> "value", "gap_seconds" -> 1800,
      "ts_unit" -> "micros"), dir, "default")
    val rows = plug.execute(evMicros).fold(e => fail(e.getMessage), identity)
      .orderBy("session_start").collect()
    // identical sessions to the nanos fixture above: the unit is
    // declared, not assumed — output stays epoch nanos
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("session_end") == 2800L * 1000000000L)
    assert(rows(0).getAs[Long]("n_events") == 2L)
    // unknown units fail loudly, never silently compress sessions
    assert(new SessionizePlugin(Map("method" -> "session_window",
      "user_column" -> "user_id", "ts_column" -> "ts",
      "value_column" -> "value", "ts_unit" -> "fortnights"),
      dir, "default")
      .execute(evMicros).left.toOption.get.getMessage
      .contains("tsUnit"))
  }

  test("asof_join plugin: most-recent-right lookup via labeled streams") {
    val clicks = Seq((1L, 100L, "a"), (1L, 300L, "b"), (2L, 50L, "c"))
      .toDF("user", "t", "tag")
    val views = Seq((1L, 90L, 10L), (1L, 250L, 20L), (2L, 60L, 30L))
      .toDF("user", "vt", "view_id")
    val plug = new AsOfJoinPlugin(Map("right_label" -> "views",
      "on" -> Seq("user"), "left_time" -> "t", "right_time" -> "vt",
      "tie_column" -> "view_id", "how" -> "left"), dir, "default")
    val out = plug.executeWith(clicks, Map("views" -> Right(views)))
      .fold(e => fail(e.getMessage), identity)
    val got = out.collect()
      .map(r => r.getString(2) -> Option(r.get(4)).map(_.toString)).toMap
    // a@100 sees view@90; b@300 sees view@250; c@50's view@60 is later
    assert(got == Map("a" -> Some("10"), "b" -> Some("20"), "c" -> None))
    val dry = plug.dryRunWith(clicks.schema, Map("views" -> Right(views.schema)))
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.dryRunWith(clicks.schema, Map.empty).isLeft)
    assert(new AsOfJoinPlugin(Map("right_label" -> "views",
      "on" -> Seq("user"), "left_time" -> "nope", "right_time" -> "vt"),
      dir, "default")
      .dryRunWith(clicks.schema, Map("views" -> Right(views.schema)))
      .left.toOption.get.getMessage.contains("'nope' not found"))
    // shared non-key name: caught at dry-run AND execute with the
    // remedy, not as an unwritable duplicate column at the sink
    val collide = new AsOfJoinPlugin(Map("right_label" -> "views",
      "on" -> Seq("user"), "left_time" -> "t", "right_time" -> "t"),
      dir, "default")
    val dupViews = views.withColumnRenamed("vt", "t")
    assert(collide.dryRunWith(clicks.schema,
        Map("views" -> Right(dupViews.schema)))
      .left.toOption.get.getMessage.contains("both sides"))
    assert(collide.executeWith(clicks, Map("views" -> Right(dupViews)))
      .left.toOption.get.getMessage.contains("both sides"))
  }

  test("e2e TOML: asof_join attributes clicks to the latest view") {
    val tmp = Files.createTempDirectory("r7asof")
    Seq((1L, 100L, "a"), (1L, 300L, "b")).toDF("user", "t", "tag")
      .coalesce(1).write.parquet(tmp.resolve("clicks.parquet").toString)
    Seq((1L, 90L, 10L), (1L, 250L, 20L)).toDF("user", "vt", "view_id")
      .coalesce(1).write.parquet(tmp.resolve("views.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "clicks"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "clicks.parquet"
         |
         |[[input_plugins]]
         |name = "views"
         |module = "parquet_scan"
         |label = "views"
         |[input_plugins.options]
         |input_path = "views.parquet"
         |
         |[[transform_plugins]]
         |name = "attribute"
         |module = "asof_join"
         |[transform_plugins.options]
         |right_label = "views"
         |on = ["user"]
         |left_time = "t"
         |right_time = "vt"
         |tie_column = "view_id"
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/attributed.parquet"
         |""".stripMargin, tmp, "out/attributed.parquet")
    assert(out.collect().map(r =>
        r.getAs[String]("tag") -> r.getAs[Long]("view_id")).toMap ==
      Map("a" -> 10L, "b" -> 20L))
  }

  test("dedup plugin: incremental_neardup against a stored corpus") {
    val tmp = Files.createTempDirectory("r6ndref")
    Seq((100L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(tmp.resolve("ref.parquet").toString)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy cat again and again"),
      (2L, "entirely new content that no stored document resembles"))
      .toDF("doc_id", "text")
    val plug = new DedupPlugin(Map("method" -> "incremental_neardup",
      "id_column" -> "doc_id", "reference_path" -> "ref.parquet",
      "threshold" -> 0.6), tmp, "default")
    val kept = plug.execute(batch).fold(e => fail(e.getMessage), identity)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    assert(plug.dryRun(batch.schema).toOption.get == batch.schema)
    assert(new DedupPlugin(Map("method" -> "incremental_neardup",
      "id_column" -> "doc_id"), tmp, "default").execute(batch)
      .left.toOption.get.getMessage.contains("reference_path"))
  }

  test("fuzzy_pairs plugin: reference_label switches to cross-table match") {
    val batch = Seq((1L, "blue bolt")).toDF("id", "name")
    val master = Seq((10L, "blue belt"), (11L, "far away"))
      .toDF("mid", "mname")
    val plug = new FuzzyPairsPlugin(Map("id_column" -> "id",
      "string_column" -> "name", "reference_label" -> "master",
      "reference_id_column" -> "mid", "reference_string_column" -> "mname",
      "max_distance" -> 1), dir, "default")
    val out = plug.executeWith(batch, Map("master" -> Right(master)))
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("left_id", "right_id", "s_l", "s_r",
      "distance"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L)))
    val dry = plug.dryRunWith(batch.schema, Map("master" -> Right(master.schema)))
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
    assert(plug.executeWith(batch, Map.empty).isLeft) // label missing
  }

  test("similarity plugin: centroid_outliers trims the far band per group") {
    // group g: 9 near the origin-ish centroid, 1 far outlier
    val vecs = ((1 to 9).map(i => (i.toLong, "g",
        Seq((i % 3).toFloat * 0.1f, (i % 2).toFloat * 0.1f))) :+
      (10L, "g", Seq(50.0f, 50.0f)))
      .toDF("vec_id", "grp", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
    val plug = new SimilarityPlugin(Map("method" -> "centroid_outliers",
      "group_by" -> Seq("grp"), "band_lo" -> 0.0, "band_hi" -> 0.8),
      dir, "default")
    val out = plug.executeWith(vecs, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("vec_id", "grp", "embedding",
      "centroid_dist", "pct_rank"))
    val kept = out.collect().map(_.getLong(0)).toSet
    assert(!kept.contains(10L)) // the far outlier is in the top band
    assert(kept.size >= 7)
    val dry = plug.dryRunWith(vecs.schema, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == out.columns.toSeq)
  }

  // --------------------------------------------------- config-driven e2e

  /** Run a TOML config end-to-end (load → plugins → pipeline) and read
    * the parquet it wrote. Also dry-runs the same registry. */
  private def runConfig(toml: String, cfgDir: java.nio.file.Path,
                        outRel: String): org.apache.spark.sql.DataFrame = {
    val cfg = cfgDir.resolve("config.toml")
    Files.writeString(cfg, toml)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val dry = Pipeline.runDryRunPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(dry.isRight, dry.left.toOption.map(_.getMessage))
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    spark.read.parquet(cfgDir.resolve(outRel).toString)
  }

  test("e2e TOML: dup_spans filter gates a parquet corpus") {
    val tmp = Files.createTempDirectory("r6spans")
    docs.coalesce(1).write.parquet(tmp.resolve("docs.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "docs.parquet"
         |
         |[[transform_plugins]]
         |name = "span-gate"
         |module = "dup_spans"
         |[transform_plugins.options]
         |id_column = "doc_id"
         |k = 8
         |mode = "filter"
         |max_coverage = 0.5
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/kept.parquet"
         |""".stripMargin, tmp, "out/kept.parquet")
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("e2e TOML: tfidf keywords from a parquet corpus") {
    val tmp = Files.createTempDirectory("r6tfidf")
    Seq((0L, "apple apple banana"), (1L, "banana cherry"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(tmp.resolve("docs.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "docs.parquet"
         |
         |[[transform_plugins]]
         |name = "keywords"
         |module = "tfidf"
         |[transform_plugins.options]
         |id_column = "doc_id"
         |k = 1
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/terms.parquet"
         |""".stripMargin, tmp, "out/terms.parquet")
    val top = out.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("term")).toMap
    assert(top(0L) == "apple")
  }

  test("e2e TOML: scd2 as_of point-in-time state") {
    val tmp = Files.createTempDirectory("r6scd")
    events.coalesce(1).write.parquet(tmp.resolve("events.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "events.parquet"
         |
         |[[transform_plugins]]
         |name = "history"
         |module = "scd2"
         |[transform_plugins.options]
         |key_columns = ["k"]
         |attr_columns = ["status"]
         |order_columns = ["dt", "id"]
         |valid_from_column = "dt"
         |as_of = "2024-02-15"
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/state.parquet"
         |""".stripMargin, tmp, "out/state.parquet")
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getAs[String]("status") == "F")
  }

  test("e2e TOML: graph pagerank over an edge list") {
    val tmp = Files.createTempDirectory("r6graph")
    Seq(("a", "c"), ("b", "c")).toDF("src", "dst").coalesce(1)
      .write.parquet(tmp.resolve("edges.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "edges.parquet"
         |
         |[[transform_plugins]]
         |name = "rank"
         |module = "graph"
         |[transform_plugins.options]
         |method = "pagerank"
         |src_column = "src"
         |dst_column = "dst"
         |iterations = 5
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/ranks.parquet"
         |""".stripMargin, tmp, "out/ranks.parquet")
    val ranks = out.collect().map(r =>
      r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks("c") > ranks("a"))
  }

  test("e2e TOML: graph pagerank with convergence tol early-exit") {
    val tmp = Files.createTempDirectory("r7graphtol")
    // 3-cycle: at its uniform fixed point immediately, so tol exits
    // after one iteration of the configured twenty
    Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst").coalesce(1)
      .write.parquet(tmp.resolve("edges.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "edges.parquet"
         |
         |[[transform_plugins]]
         |name = "rank"
         |module = "graph"
         |[transform_plugins.options]
         |method = "pagerank"
         |src_column = "src"
         |dst_column = "dst"
         |iterations = 20
         |tol = 1e-9
         |checkpoint_interval = 5
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/ranks.parquet"
         |""".stripMargin, tmp, "out/ranks.parquet")
    val ranks = out.collect().map(r =>
      r.getAs[String]("node") -> r.getAs[Double]("rank")).toMap
    assert(ranks.size == 3)
    ranks.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }

  test("e2e TOML: weighted sample picks exactly k rows") {
    val tmp = Files.createTempDirectory("r6wsample")
    (1L to 100L).map(i => (i, if (i <= 50) 1.0 else 50.0)).toDF("id", "w")
      .coalesce(1).write.parquet(tmp.resolve("rows.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "rows.parquet"
         |
         |[[transform_plugins]]
         |name = "pick"
         |module = "sample"
         |[transform_plugins.options]
         |method = "weighted"
         |key_column = "id"
         |weight_column = "w"
         |k = 10
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/sample.parquet"
         |""".stripMargin, tmp, "out/sample.parquet")
    assert(out.count() == 10)
  }

  test("e2e TOML: bm25 retrieval over a parquet corpus") {
    val tmp = Files.createTempDirectory("r6bm25")
    docs.coalesce(1).write.parquet(tmp.resolve("docs.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "docs.parquet"
         |
         |[[transform_plugins]]
         |name = "search"
         |module = "bm25"
         |[transform_plugins.options]
         |id_column = "doc_id"
         |k = 3
         |[transform_plugins.options.queries]
         |qa = "unique zero"
         |qb = "different words"
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/hits.parquet"
         |""".stripMargin, tmp, "out/hits.parquet")
    val hits = out.collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(hits == Set(("qa", 0L), ("qb", 2L)))
  }

  test("e2e TOML: top_ngrams boilerplate discovery") {
    val tmp = Files.createTempDirectory("r6ngrams")
    docs.coalesce(1).write.parquet(tmp.resolve("docs.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "docs.parquet"
         |
         |[[transform_plugins]]
         |name = "grams"
         |module = "top_ngrams"
         |[transform_plugins.options]
         |id_column = "doc_id"
         |n = 2
         |k = 1
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/grams.parquet"
         |""".stripMargin, tmp, "out/grams.parquet")
    val top = out.collect()(0)
    assert(top.getString(1) == "a b" && top.getLong(2) == 2L)
  }

  test("e2e TOML: fuzzy_pairs entity resolution") {
    val tmp = Files.createTempDirectory("r6fuzzy")
    Seq((1L, "blue bolt"), (2L, "blue belt"), (3L, "other thing"))
      .toDF("id", "name").coalesce(1)
      .write.parquet(tmp.resolve("names.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "names.parquet"
         |
         |[[transform_plugins]]
         |name = "match"
         |module = "fuzzy_pairs"
         |[transform_plugins.options]
         |id_column = "id"
         |string_column = "name"
         |max_distance = 1
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/pairs.parquet"
         |""".stripMargin, tmp, "out/pairs.parquet")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L)))
  }

  test("e2e TOML: interval_join enriches points from a labeled band stream") {
    val tmp = Files.createTempDirectory("r6ivj")
    Seq((1L, 5L), (2L, 55L), (3L, 999L)).toDF("pid", "p")
      .coalesce(1).write.parquet(tmp.resolve("points.parquet").toString)
    Seq((10L, 0L, 9L), (20L, 50L, 59L)).toDF("band_id", "lo", "hi")
      .coalesce(1).write.parquet(tmp.resolve("bands.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "points"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "points.parquet"
         |
         |[[input_plugins]]
         |name = "bands"
         |module = "parquet_scan"
         |label = "bands"
         |[input_plugins.options]
         |input_path = "bands.parquet"
         |
         |[[transform_plugins]]
         |name = "enrich"
         |module = "interval_join"
         |[transform_plugins.options]
         |point_column = "p"
         |lo_column = "lo"
         |hi_column = "hi"
         |intervals_label = "bands"
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/enriched.parquet"
         |""".stripMargin, tmp, "out/enriched.parquet")
    assert(out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("e2e TOML: similarity knn_components semantic clustering") {
    val tmp = Files.createTempDirectory("r6knn")
    Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding").coalesce(1)
      .write.parquet(tmp.resolve("vecs.parquet").toString)
    val out = runConfig(
      s"""
         |[[input_plugins]]
         |name = "scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "vecs.parquet"
         |
         |[[transform_plugins]]
         |name = "cluster"
         |module = "similarity"
         |[transform_plugins.options]
         |method = "knn_components"
         |knn_method = "brute"
         |id_column = "vec_id"
         |k = 1
         |min_cosine = 0.9
         |
         |[[output_plugins]]
         |name = "sink"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/clusters.parquet"
         |""".stripMargin, tmp, "out/clusters.parquet")
    val byId = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }
}
