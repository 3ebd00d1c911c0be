package graft.core

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** `.scala` source-file plugin loading e2e — the JVM twin of the
  * reference loading a `.py` file at runtime (loader.py:44-61): a
  * config `module` pointing at a SINGLE source file compiles
  * in-process and its plugin classes load, route, and execute — no
  * jar step, no engine rebuild. */
class LoaderSourceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def pluginSource(marker: Int): String =
    s"""package thirdparty
       |
       |import java.nio.file.Path
       |import org.apache.spark.sql.DataFrame
       |import org.apache.spark.sql.functions.lit
       |import org.apache.spark.sql.types.{IntegerType, StructType}
       |
       |class SourceMarkerPlugin(val options: Map[String, Any],
       |    val configDir: Path, override val label: String)
       |    extends graft.core.TransformPlugin {
       |  def name: String = "source_marker"
       |  def execute(df: DataFrame): Either[Throwable, DataFrame] =
       |    Right(df.withColumn("from_source", lit($marker)))
       |  def dryRun(schema: StructType): Either[Throwable, StructType] =
       |    Right(schema.add("from_source", IntegerType))
       |}
       |""".stripMargin

  private def writePlugin(dir: Path, marker: Int): Path = {
    val src = dir.resolve("my_plugin.scala")
    Files.writeString(src, pluginSource(marker))
    src
  }

  test("a .scala file referenced by path compiles, loads, and executes") {
    val dir = Files.createTempDirectory("srcplug")
    writePlugin(dir, 42)
    // relative path resolves against the CONFIG dir, like jars (A21)
    val cfg = GraftConfig(
      inputPlugins = Seq.empty,
      transformPlugins = Seq(PluginConfig("my_plugin.scala", label = "s1")),
      outputPlugins = Seq.empty)
    val reg = Loader.loadPlugins(cfg, dir.resolve("config.toml"))
      .fold(e => fail(e.getMessage), identity)
    assert(reg.transforms.map(_.name) == Seq("source_marker"))
    assert(reg.transforms.head.label == "s1")

    import spark.implicits._
    val out = reg.transforms.head.execute(Seq(1L, 2L).toDF("a"))
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("a", "from_source"))
    assert(out.select("from_source").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(42))
    val schema = reg.transforms.head.dryRun(Seq(1L).toDF("a").schema)
      .fold(e => fail(e.getMessage), identity)
    assert(schema.fieldNames.toSeq == Seq("a", "from_source"))
  }

  test("an edited source file recompiles (versioned compile cache)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("srcswap")
    def marker(): Int = {
      val cfg = GraftConfig(
        inputPlugins = Seq.empty,
        transformPlugins = Seq(PluginConfig("my_plugin.scala")),
        outputPlugins = Seq.empty)
      Loader.loadPlugins(cfg, dir.resolve("config.toml"))
        .fold(e => fail(e.getMessage), identity)
        .transforms.head.execute(Seq(1L).toDF("a"))
        .fold(e => fail(e.getMessage), identity)
        .select("from_source").collect()(0).getInt(0)
    }
    writePlugin(dir, 42)
    assert(marker() == 42)
    // same-size edit + coarse-mtime filesystems: the (path, mtime,
    // size) key must still flip on the rewrite
    Thread.sleep(1100)
    writePlugin(dir, 43)
    assert(marker() == 43)
  }

  test("compile errors surface as PluginLoadError with positions") {
    val dir = Files.createTempDirectory("srcbad")
    Files.writeString(dir.resolve("bad.scala"),
      "class Nope { def x: Int = \"not an int\" }\n")
    val e = Loader.loadFromFile("bad.scala", Map.empty, dir, "default")
      .left.toOption.get
    assert(e.getMessage.contains("compilation failed"), e.getMessage)
    assert(e.getMessage.contains("bad.scala"), e.getMessage)
  }

  test("a source file without plugin classes fails discovery") {
    val dir = Files.createTempDirectory("srcempty")
    Files.writeString(dir.resolve("plain.scala"),
      "class Plain { def x: Int = 1 }\n")
    val e = Loader.loadFromFile("plain.scala", Map.empty, dir, "default")
      .left.toOption.get
    assert(e.getMessage.contains("no BasePlugin subclasses found"))
  }

  test(".scala modules route through the filesystem branch") {
    assert(Loader.isFilesystemPath("my_plugin.scala"))
    assert(Loader.isFilesystemPath("plugins/my_plugin.scala"))
    assert(!Loader.isFilesystemPath("graft.plugins.transform.FilterPlugin"))
  }
}
