package graft.core

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference config suite
  * (packages/cryoflow-core/tests/config/test_load_config.py and the
  * TOML fixtures in tests/conftest.py:96-149). */
class ConfigSpec extends AnyFunSuite {

  private val valid =
    """
      |[[input_plugins]]
      |module = "parquet_scan"
      |label = "sales"
      |[input_plugins.options]
      |input_path = "data/input.parquet"
      |
      |[[transform_plugins]]
      |module = "column_multiplier"
      |enabled = false
      |[transform_plugins.options]
      |column_name = "amount"
      |multiplier = 2
      |
      |[[output_plugins]]
      |module = "parquet_writer"
      |[output_plugins.options]
      |output_path = "out/result.parquet"
      |""".stripMargin

  private def parse(s: String) = Toml.parse(s)

  test("valid config parses with labels, options, enabled flag") {
    val tmp = Files.createTempFile("cfg", ".toml")
    Files.writeString(tmp, valid)
    val cfg = Config.loadConfig(tmp).fold(e => fail(e.getMessage), identity)
    assert(cfg.inputPlugins.map(_.module) == Seq("parquet_scan"))
    assert(cfg.inputPlugins.head.label == "sales")
    assert(cfg.inputPlugins.head.options("input_path") == "data/input.parquet")
    assert(cfg.transformPlugins.head.enabled == false)
    assert(cfg.transformPlugins.head.options("multiplier") == 2L)
    assert(cfg.outputPlugins.head.label == "default") // default label
    assert(cfg.outputPlugins.head.enabled)            // default enabled
  }

  test("missing file fails with 'Config file not found'") {
    val e = Config.loadConfig(Paths.get("/nope/missing.toml")).left.toOption.get
    assert(e.getMessage.contains("Config file not found"))
  }

  test("syntax error fails with parse-stage message") {
    val tmp = Files.createTempFile("bad", ".toml")
    Files.writeString(tmp, "[[input_plugins\nmodule =")
    val e = Config.loadConfig(tmp).left.toOption.get
    assert(e.getMessage.contains("Failed to parse config file"))
  }

  test("missing required 'module' field fails validation") {
    val tmp = Files.createTempFile("nomod", ".toml")
    Files.writeString(tmp, "[[input_plugins]]\nenabled = true\n")
    val e = Config.loadConfig(tmp).left.toOption.get
    assert(e.getMessage.contains("Invalid config"))
    assert(e.getMessage.contains("module"))
  }

  test("empty plugin lists are valid (guards happen in CLI)") {
    val tmp = Files.createTempFile("empty", ".toml")
    Files.writeString(tmp, "# nothing\n")
    val cfg = Config.loadConfig(tmp).fold(e => fail(e.getMessage), identity)
    assert(cfg.inputPlugins.isEmpty && cfg.outputPlugins.isEmpty)
  }

  test("TOML subset: scalars, arrays, comments, quoted strings") {
    val tree = parse(
      """a = 1
        |b = 2.5            # trailing comment
        |c = "has # hash and \"quote\""
        |d = ['x', "y"]
        |e = true
        |[tbl]
        |f = [1, 2, 3]
        |""".stripMargin).fold(e => fail(e.getMessage), identity)
    assert(tree("a") == 1L)
    assert(tree("b") == 2.5)
    assert(tree("c") == "has # hash and \"quote\"")
    assert(tree("d") == Seq("x", "y"))
    assert(tree("e") == true)
    assert(tree("tbl").asInstanceOf[Map[String, Any]]("f") == Seq(1L, 2L, 3L))
  }

  test("bindSafe wraps failures with the message prefix (ref result.py:12-41)") {
    val f = Errors.bindSafe[Int, Int](x => 10 / x,
      (m, c) => new ConfigLoadError(m, c), "Division stage failed")
    assert(f(5) == Right(2))
    val err = f(0).left.toOption.get
    assert(err.isInstanceOf[ConfigLoadError])
    assert(err.getMessage.startsWith("Division stage failed: "))
  }

  test("XDG default config path") {
    val p = Config.getConfigPath(None)
    assert(p.toString.endsWith("graft/config.toml"))
    val explicit = Paths.get("/tmp/x.toml")
    assert(Config.getConfigPath(Some(explicit)) == explicit)
  }
}
