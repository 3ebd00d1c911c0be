package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Mirrors the reference CLI suite (tests/cli/test_run_success.py,
  * test_check_errors.py): exit codes and stdout/stderr fragments for
  * run/check, missing config, invalid pipelines. Drives Main.run
  * in-process (it reuses the shared session). */
class CliSpec extends AnyFunSuite {
  // initialize the shared session before Main so the CLI reuses it
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def withCapture(body: => Int): (Int, String, String) = {
    val out = new java.io.ByteArrayOutputStream()
    val err = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(out)(Console.withErr(err)(body))
    (code, out.toString, err.toString)
  }

  private def writeConfig(extraTransform: String = ""): java.nio.file.Path = {
    val tmp = Files.createTempDirectory("cli")
    Seq((100L, "a"), (200L, "b")).toDF("amount", "item")
      .coalesce(1).write.parquet(tmp.resolve("in.parquet").toString)
    val cfg = tmp.resolve("config.toml")
    // the transform_plugins key is REQUIRED (ref config.py:24-29) —
    // an empty TOP-LEVEL list (before any table header) when no
    // transform is configured
    val emptyTransforms =
      if (extraTransform.isEmpty) "transform_plugins = []" else ""
    Files.writeString(cfg,
      s"""$emptyTransforms
         |[[input_plugins]]
         |name = "parquet-scan"
         |module = "parquet_scan"
         |[input_plugins.options]
         |input_path = "in.parquet"
         |$extraTransform
         |[[output_plugins]]
         |name = "parquet-writer"
         |module = "parquet_writer"
         |[output_plugins.options]
         |output_path = "out/result.parquet"
         |""".stripMargin)
    cfg
  }

  test("run: success prints plugin table and [SUCCESS], exit 0") {
    val cfg = writeConfig()
    val (code, out, _) = withCapture(Main.run(Array("run", "-c", cfg.toString)))
    assert(code == 0)
    assert(out.contains("Input plugins (1):"))
    assert(out.contains("- parquet_scan (label: default)"))
    assert(out.contains("[SUCCESS] Pipeline completed successfully"))
    assert(spark.read.parquet(
      cfg.getParent.resolve("out/result.parquet").toString).count() == 2)
  }

  test("check: prints output schema and validation success, exit 0") {
    val cfg = writeConfig()
    val (code, out, _) = withCapture(Main.run(Array("check", "-c", cfg.toString)))
    assert(code == 0)
    assert(out.contains("Output schema:"))
    assert(out.contains("amount: bigint"))
    assert(out.contains("item: string"))
    assert(out.contains("[SUCCESS] Pipeline validation passed"))
  }

  test("check: invalid transform column fails with [ERROR], exit 1") {
    val cfg = writeConfig(
      """
        |[[transform_plugins]]
        |name = "column-multiplier"
        |module = "column_multiplier"
        |[transform_plugins.options]
        |column_name = "missing_col"
        |multiplier = 2
        |""".stripMargin)
    val (code, _, err) = withCapture(Main.run(Array("check", "-c", cfg.toString)))
    assert(code == 1)
    assert(err.contains("[ERROR] Pipeline validation failed"))
    assert(err.contains("Column 'missing_col' not found in schema"))
  }

  test("missing config file: [ERROR] Config file not found, exit 1") {
    val (code, _, err) = withCapture(Main.run(Array("run", "-c", "/nope.toml")))
    assert(code == 1)
    assert(err.contains("Config file not found"))
  }

  test("guards: empty input list trips CLI guard, exit 1 (ref run.py:51-52)") {
    val tmp = Files.createTempDirectory("cli")
    val cfg = tmp.resolve("config.toml")
    Files.writeString(cfg,
      """input_plugins = []
        |transform_plugins = []
        |
        |[[output_plugins]]
        |name = "parquet-writer"
        |module = "parquet_writer"
        |[output_plugins.options]
        |output_path = "x.parquet"
        |""".stripMargin)
    val (code, _, err) = withCapture(Main.run(Array("run", "-c", cfg.toString)))
    assert(code == 1)
    assert(err.contains("No input plugin configured"))
  }

  test("missing plugin-list key fails validation before any guard (ref MISSING_FIELDS_TOML)") {
    val tmp = Files.createTempDirectory("cli")
    val cfg = tmp.resolve("config.toml")
    Files.writeString(cfg, "transform_plugins = []\n")
    val (code, _, err) = withCapture(Main.run(Array("run", "-c", cfg.toString)))
    assert(code == 1)
    assert(err.contains("Config validation failed"))
    assert(err.contains("Field required"))
  }

  test("--version and unknown command") {
    val (code, out, _) = withCapture(Main.run(Array("--version")))
    assert(code == 0 && out.contains("graft"))
    val (code2, out2, _) = withCapture(Main.run(Array("bogus")))
    assert(code2 == 1 && out2.contains("Unknown command"))
  }
}
