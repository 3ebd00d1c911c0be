package graft.e2e

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.{Config, Loader, Pipeline}
import graft.plugins.input.ParquetScanPlugin
import graft.plugins.output.ParquetWriterPlugin
import graft.plugins.transform.ColumnMultiplierPlugin

/** Mirrors the reference e2e suite
  * (packages/cryoflow-core/tests/e2e/test_e2e_integration.py):
  * parquet → ×2 → parquet with exact values; chained multipliers;
  * nested dir creation; config-driven run via the library API. */
class E2ESpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def writeInput(dir: java.nio.file.Path): String = {
    val p = dir.resolve("input.parquet").toString
    Seq((100L, "a"), (200L, "b"), (300L, "c")).toDF("amount", "item")
      .coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  test("parquet -> x2 -> parquet yields {200,400,600} (ref e2e:15-46)") {
    val tmp = Files.createTempDirectory("e2e")
    val in = writeInput(tmp)
    val out = tmp.resolve("out.parquet").toString
    val result = Pipeline.runPipeline(
      inputs = Seq(new ParquetScanPlugin(Map("input_path" -> in), tmp, "default")),
      transforms = Seq(new ColumnMultiplierPlugin(
        Map("column_name" -> "amount", "multiplier" -> 2), tmp, "default")),
      outputs = Seq(new ParquetWriterPlugin(Map("output_path" -> out), tmp, "default")))
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val vals = spark.read.parquet(out).select("amount").as[Long]
      .collect().sorted.toSeq
    assert(vals == Seq(200L, 400L, 600L))
  }

  test("chained x2 x3 = x6 (ref e2e:78-104)") {
    val tmp = Files.createTempDirectory("e2e")
    val in = tmp.resolve("in.parquet").toString
    Seq(10L, 20L, 30L).toDF("value").coalesce(1).write.parquet(in)
    val out = tmp.resolve("out.parquet").toString
    val result = Pipeline.runPipeline(
      inputs = Seq(new ParquetScanPlugin(Map("input_path" -> in), tmp, "default")),
      transforms = Seq(
        new ColumnMultiplierPlugin(Map("column_name" -> "value", "multiplier" -> 2), tmp, "default"),
        new ColumnMultiplierPlugin(Map("column_name" -> "value", "multiplier" -> 3), tmp, "default")),
      outputs = Seq(new ParquetWriterPlugin(Map("output_path" -> out), tmp, "default")))
    assert(result.isRight)
    assert(spark.read.parquet(out).select("value").as[Long].collect().sorted.toSeq
      == Seq(60L, 120L, 180L))
  }

  test("nested output dirs are created (ref e2e:106-128)") {
    val tmp = Files.createTempDirectory("e2e")
    val in = writeInput(tmp)
    val out = tmp.resolve("deeply/nested/dirs/out.parquet").toString
    val result = Pipeline.runPipeline(
      inputs = Seq(new ParquetScanPlugin(Map("input_path" -> in), tmp, "default")),
      transforms = Seq.empty,
      outputs = Seq(new ParquetWriterPlugin(Map("output_path" -> out), tmp, "default")))
    assert(result.isRight)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("config-driven end-to-end with relative paths (ref e2e:130-206)") {
    val tmp = Files.createTempDirectory("e2ecfg")
    writeInput(tmp.resolve("data").tap(Files.createDirectories(_)))
    val cfg = tmp.resolve("config.toml")
    Files.writeString(cfg,
      """
        |[[input_plugins]]
        |name = "parquet-scan"
        |module = "parquet_scan"
        |[input_plugins.options]
        |input_path = "data/input.parquet"
        |
        |[[transform_plugins]]
        |name = "column-multiplier"
        |module = "column_multiplier"
        |[transform_plugins.options]
        |column_name = "amount"
        |multiplier = 2
        |
        |[[output_plugins]]
        |name = "parquet-writer"
        |module = "parquet_writer"
        |[output_plugins.options]
        |output_path = "out/result.parquet"
        |""".stripMargin)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val vals = spark.read.parquet(tmp.resolve("out/result.parquet").toString)
      .select("amount").as[Long].collect().sorted.toSeq
    assert(vals == Seq(200L, 400L, 600L))

    // dry run over the same registry: schema passes through unchanged
    val dry = Pipeline.runDryRunPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(dry.toOption.get.fieldNames.toSeq == Seq("amount", "item"))
  }

  test("multi-label streams: config-driven join of two labeled inputs") {
    val tmp = Files.createTempDirectory("e2elbl")
    Files.createDirectories(tmp.resolve("data"))
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .coalesce(1).write.parquet(tmp.resolve("data/facts.parquet").toString)
    Seq((1L, "one"), (2L, "two")).toDF("k", "name")
      .coalesce(1).write.parquet(tmp.resolve("data/dims.parquet").toString)
    val cfg = tmp.resolve("config.toml")
    Files.writeString(cfg,
      """
        |[[input_plugins]]
        |name = "parquet-scan"
        |module = "parquet_scan"
        |[input_plugins.options]
        |input_path = "data/facts.parquet"
        |
        |[[input_plugins]]
        |name = "parquet-scan"
        |module = "parquet_scan"
        |label = "dims"
        |[input_plugins.options]
        |input_path = "data/dims.parquet"
        |
        |[[transform_plugins]]
        |name = "join"
        |module = "join"
        |[transform_plugins.options]
        |right_label = "dims"
        |on = ["k"]
        |broadcast = true
        |
        |[[transform_plugins]]
        |name = "sort"
        |module = "sort"
        |[transform_plugins.options]
        |by = ["k"]
        |
        |[[output_plugins]]
        |name = "parquet-writer"
        |module = "parquet_writer"
        |[output_plugins.options]
        |output_path = "out/joined.parquet"
        |""".stripMargin)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    assert(reg.inputs.map(_.label) == Seq("default", "dims"))
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val out = spark.read.parquet(tmp.resolve("out/joined.parquet").toString)
    assert(out.columns.toSeq == Seq("k", "v", "name"))
    // inner join drops k=3 (no dim row)
    assert(out.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "one"), (2L, "two")))
  }

  test("examples/corpus_clean.toml: the full cleaning pipeline runs e2e") {
    val src = java.nio.file.Paths.get("examples/corpus_clean.toml")
    assume(java.nio.file.Files.exists(src))
    // copy to a writable tmp dir so the relative output path lands there
    val tmp = java.nio.file.Files.createTempDirectory("cleancfg")
    val cfg = tmp.resolve("corpus_clean.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    assert(reg.transforms.map(_.name) ==
      Seq("redact_pii", "text_analysis", "gopher_filter", "filter",
        "dedup", "sample"))
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val out = spark.read.parquet(tmp.resolve("out/clean_corpus.parquet").toString)
    assert(out.count() > 0)
    // analysis columns present, quality gate applied, only weighted sources
    assert(out.columns.contains("quality") && out.columns.contains("n_emails"))
    assert(out.agg(org.apache.spark.sql.functions.min("quality"))
      .collect()(0).getDouble(0) >= 0.3)
    val sources = out.select("source").distinct()
      .collect().map(_.getString(0)).toSet
    assert(sources.subsetOf(Set("src0", "src1", "src2")) && sources.nonEmpty)
  }

  test("examples/ann_search.toml: labeled query stream through IVF-PQ") {
    val src = java.nio.file.Paths.get("examples/ann_search.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("anncfg")
    val cfg = tmp.resolve("ann_search.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val out = spark.read.parquet(tmp.resolve("out/neighbors.parquet").toString)
    assert(out.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rank"))
    assert(out.count() == 50) // 10 queries × k=5
  }

  test("examples/pretrain_shard.toml: chunk -> clustered shards + stats") {
    val src = java.nio.file.Paths.get("examples/pretrain_shard.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("shardcfg")
    val cfg = tmp.resolve("pretrain_shard.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))

    val shards = spark.read.parquet(tmp.resolve("out/shards").toString)
    assert(shards.columns.toSeq ==
      Seq("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"))
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(shards.count() > docs, "windows should outnumber documents")
    // clustered into the configured number of files
    val nFiles = java.nio.file.Files.list(tmp.resolve("out/shards"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(nFiles == 4, s"expected 4 clustered shard files, got $nFiles")

    val stats = spark.read
      .parquet(tmp.resolve("out/corpus_stats.parquet").toString)
    assert(stats.count() == 4) // one row per profiled column
    val byCol = stats.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCol.keySet == Set("doc_id", "lang", "source", "n_chars"))
    assert(byCol("doc_id") == docs)
  }

  test("the reference's own examples/config.toml runs unmodified") {
    val refDir = java.nio.file.Paths.get("/root/reference/examples")
    assume(java.nio.file.Files.exists(refDir.resolve("config.toml")))
    // copy config + data to a writable dir (the config's output path
    // is relative, so it must land beside the copied config)
    val tmp = java.nio.file.Files.createTempDirectory("refcfg")
    java.nio.file.Files.createDirectories(tmp.resolve("data"))
    java.nio.file.Files.copy(refDir.resolve("config.toml"),
      tmp.resolve("config.toml"))
    java.nio.file.Files.copy(refDir.resolve("data/sample_sales.parquet"),
      tmp.resolve("data/sample_sales.parquet"))
    val cfg = tmp.resolve("config.toml")
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    // reference module paths resolve through the compat aliases
    assert(config.inputPlugins.head.module ==
      "cryoflow_plugin_collections.input.parquet_scan")
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val in = spark.read.parquet(tmp.resolve("data/sample_sales.parquet").toString)
    val out = spark.read.parquet(tmp.resolve("data/output.parquet").toString)
    assert(out.count() == in.count())
    // the multiplier doubled total_amount, everything else untouched
    def amountSum(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("total_amount").cast("double")))
        .collect()(0).getDouble(0)
    assert(math.abs(amountSum(out) - 2 * amountSum(in)) < 1e-6)
  }

  implicit private class Tap[A](a: A) {
    def tap(f: A => Unit): A = { f(a); a }
  }

  test("examples/corpus_audit.toml: band trim -> bm25 probes + gram scan") {
    val src = java.nio.file.Paths.get("examples/corpus_audit.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("auditcfg")
    val cfg = tmp.resolve("corpus_audit.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))

    val hits = spark.read
      .parquet(tmp.resolve("out/query_hits.parquet").toString)
    assert(hits.columns.toSeq == Seq("query_id", "rank", "doc_id", "score"))
    val perQuery = hits.groupBy("query_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perQuery.keySet == Set("tables", "streams"))
    assert(perQuery.values.forall(n => n >= 1 && n <= 5))

    val grams = spark.read
      .parquet(tmp.resolve("out/top_bigrams.parquet").toString)
    assert(grams.columns.toSeq ==
      Seq("rank", "ngram", "n_occurrences", "n_docs"))
    assert(grams.count() == 20)
    // frequency-ranked: rank 1 holds the max occurrence count
    val rows = grams.orderBy("rank").collect()
    assert(rows.map(_.getLong(2)).sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("examples/snapshot_ingest.toml: gate -> commit; rerun appends a version") {
    val src = java.nio.file.Paths.get("examples/snapshot_ingest.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("snapcfg")
    val cfg = tmp.resolve("snapshot_ingest.toml")
    java.nio.file.Files.copy(src, cfg)
    def runOnce(): Unit = {
      val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
      val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
      val r = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
      assert(r.isRight, r.left.toOption.map(_.getMessage))
    }
    runOnce()
    val store = tmp.resolve("out/corpus_snapshots").toString
    assert(graft.sources.Snapshots.versions(spark, store) == Seq(1))
    val v1 = graft.sources.Snapshots.read(spark, store, 1).count()
    assert(v1 > 0)
    runOnce() // same config again: a NEW version, v1 untouched
    assert(graft.sources.Snapshots.versions(spark, store) == Seq(1, 2))
    assert(graft.sources.Snapshots.read(spark, store, 1).count() == v1)
    assert(graft.sources.Snapshots.read(spark, store).count() == 2 * v1)
  }

  test("examples/vector_index.toml: build index, serve queries from disk") {
    val src = java.nio.file.Paths.get("examples/vector_index.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("vidxcfg")
    val cfg = tmp.resolve("vector_index.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))

    assert(java.nio.file.Files.exists(tmp.resolve("out/ann_index/centroids")))
    val nb = spark.read.parquet(tmp.resolve("out/neighbors.parquet").toString)
    assert(nb.columns.toSeq == Seq("query_id", "neighbor_id", "cosine", "rank"))
    assert(nb.count() == 50) // 10 probes x k=5
    // index_build passed the corpus through untouched
    val idx = spark.read
      .parquet(tmp.resolve("out/indexed_corpus.parquet").toString)
    assert(idx.count() == spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").count())
  }

  test("examples/classify_quality.toml: temperature mix -> NB scoring") {
    val src = java.nio.file.Paths.get("examples/classify_quality.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("clscfg")
    val cfg = tmp.resolve("classify_quality.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))

    val preds = spark.read
      .parquet(tmp.resolve("out/predictions").toString)
    assert(preds.columns.toSeq == Seq("doc_id", "pred", "score"))
    val n = preds.count()
    assert(n > 100 && n <= 500, s"n=$n") // flattened stream, all scored
    // predictions stay inside the label alphabet of the train slice
    val langs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val predSet = preds.select("pred").distinct()
      .collect().map(_.getString(0)).toSet
    assert(predSet.subsetOf(langs), s"$predSet not in $langs")
  }

  test("examples/train_order.toml: keep-best dedup -> seeded shuffle " +
      "-> ordered shard layout") {
    val src = java.nio.file.Paths.get("examples/train_order.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("ordercfg")
    val cfg = tmp.resolve("train_order.toml")
    java.nio.file.Files.copy(src, cfg)
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val out = spark.read.parquet(tmp.resolve("out/train_shards").toString)
    val total = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    val n = out.count()
    assert(n > 0 && n < total, s"dedup should drop some of $total, kept $n")
    // hive layout: one dir per shard; in-shard pos dense from 1
    val dirs = java.nio.file.Files.list(tmp.resolve("out/train_shards"))
      .filter(p => p.getFileName.toString.startsWith("shard="))
      .count()
    assert(dirs == 4, s"expected 4 shard dirs, got $dirs")
    import org.apache.spark.sql.functions.{col => c, max => mx, count => cnt}
    val perShard = out.groupBy("shard")
      .agg(mx(c("pos")).as("mp"), cnt(c("pos")).as("np"))
      .collect()
    perShard.foreach(r =>
      assert(r.getAs[Long]("mp") == r.getAs[Long]("np"),
        s"positions not dense in shard ${r.get(0)}"))
  }

  test("examples/custom_plugin.toml: a .scala source plugin composes " +
      "with built-ins in one pipeline") {
    val src = java.nio.file.Paths.get("examples/custom_plugin.toml")
    assume(java.nio.file.Files.exists(src))
    val tmp = java.nio.file.Files.createTempDirectory("srccfg")
    val cfg = tmp.resolve("custom_plugin.toml")
    java.nio.file.Files.copy(src, cfg)
    // the plugin source travels with the config (relative module path)
    java.nio.file.Files.createDirectories(tmp.resolve("plugins"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("examples/plugins/words_per_line.scala"),
      tmp.resolve("plugins/words_per_line.scala"))
    val config = Config.loadConfig(cfg).fold(e => fail(e.getMessage), identity)
    val reg = Loader.loadPlugins(config, cfg).fold(e => fail(e.getMessage), identity)
    assert(reg.transforms.map(_.name) == Seq("words_per_line", "filter"))
    // dry-run (`check`) sees the user plugin's declared column too
    val dry = Pipeline.runDryRunPipeline(reg.inputs, reg.transforms,
      reg.outputs)
    assert(dry.isRight, dry.left.toOption.map(_.getMessage))
    val result = Pipeline.runPipeline(reg.inputs, reg.transforms, reg.outputs)
    assert(result.isRight, result.left.toOption.map(_.getMessage))
    val out = spark.read.parquet(tmp.resolve("out/prose_docs.parquet").toString)
    assert(out.columns.contains("words_per_line"))
    assert(out.count() > 0)
    assert(out.agg(org.apache.spark.sql.functions.min("words_per_line"))
      .collect()(0).getDouble(0) >= 2.0)
  }
}
