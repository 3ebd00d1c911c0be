package graft.core

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Jar/file plugin loading e2e — mirrors the reference's
  * tests/loader/test_load_plugins.py filesystem-path branch
  * (loader.py:21-61): a config `module` that is a path loads plugin
  * classes from that file without the engine knowing them at build
  * time. The test COMPILES a third-party Java plugin with the JDK
  * compiler, jars it, and loads it through the config path. */
class LoaderJarSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** A plugin source the engine has never seen: implements the
    * TransformPlugin trait (a plain JVM interface) from Java; MARKER
    * is substituted per build so jar-replacement tests can tell
    * versions apart. */
  private def pluginSourceWithMarker(marker: Int): String =
    template.replace("MARKER", marker.toString)

  private val template =
    """package thirdparty;
      |
      |import java.nio.file.Path;
      |import org.apache.spark.sql.Dataset;
      |import org.apache.spark.sql.Row;
      |import org.apache.spark.sql.functions;
      |import org.apache.spark.sql.types.DataTypes;
      |import org.apache.spark.sql.types.StructType;
      |
      |public class JarMarkerPlugin implements graft.core.TransformPlugin {
      |  private final scala.collection.immutable.Map<String, Object> options;
      |  private final Path configDir;
      |  private final String label;
      |
      |  public JarMarkerPlugin(scala.collection.immutable.Map<String, Object> options,
      |                         Path configDir, String label) {
      |    this.options = options;
      |    this.configDir = configDir;
      |    this.label = label;
      |  }
      |
      |  public String name() { return "jar_marker"; }
      |  public scala.collection.immutable.Map<String, Object> options() { return options; }
      |  public Path configDir() { return configDir; }
      |  @Override public String label() { return label; }
      |
      |  public scala.util.Either<Throwable, Dataset<Row>> execute(Dataset<Row> df) {
      |    return new scala.util.Right<>(df.withColumn("from_jar", functions.lit(MARKER)));
      |  }
      |
      |  public scala.util.Either<Throwable, StructType> dryRun(StructType schema) {
      |    return new scala.util.Right<>(schema.add("from_jar", DataTypes.IntegerType));
      |  }
      |}
      |""".stripMargin

  /** Compile `pluginSource` with the in-JVM JDK compiler and pack the
    * class into plugin.jar under `dir`. Tests fork, so
    * java.class.path carries the full Spark+graft classpath. */
  private def buildPluginJar(dir: Path, marker: Int = 42): Path = {
    val src = dir.resolve("thirdparty/JarMarkerPlugin.java")
    Files.createDirectories(src.getParent)
    Files.writeString(src, pluginSourceWithMarker(marker))
    val classesDir = dir.resolve("classes")
    Files.createDirectories(classesDir)
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(compiler != null, "JDK compiler unavailable")
    val rc = compiler.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", classesDir.toString, src.toString)
    assert(rc == 0, "javac failed")
    val jarPath = dir.resolve("plugin.jar")
    val jos = new JarOutputStream(Files.newOutputStream(jarPath))
    try {
      val rel = "thirdparty/JarMarkerPlugin.class"
      jos.putNextEntry(new JarEntry(rel))
      jos.write(Files.readAllBytes(classesDir.resolve(rel)))
      jos.closeEntry()
    } finally jos.close()
    jarPath
  }

  test("a plugin jar referenced by path loads, routes, and executes") {
    val dir = Files.createTempDirectory("jarplug")
    buildPluginJar(dir)
    // relative path resolves against the CONFIG dir (A21/loader.py:33)
    val cfg = GraftConfig(
      inputPlugins = Seq.empty,
      transformPlugins = Seq(PluginConfig("plugin.jar", label = "s1")),
      outputPlugins = Seq.empty)
    val reg = Loader.loadPlugins(cfg, dir.resolve("config.toml"))
      .fold(e => fail(e.getMessage), identity)
    assert(reg.transforms.map(_.name) == Seq("jar_marker"))
    assert(reg.transforms.head.label == "s1")

    import spark.implicits._
    val out = reg.transforms.head.execute(Seq(1L, 2L).toDF("a"))
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("a", "from_jar"))
    assert(out.select("from_jar").distinct().collect().map(_.getInt(0)).toSeq == Seq(42))
    val schema = reg.transforms.head.dryRun(Seq(1L).toDF("a").schema)
      .fold(e => fail(e.getMessage), identity)
    assert(schema.fieldNames.toSeq == Seq("a", "from_jar"))
  }

  test("a replaced jar serves fresh classes (versioned loader cache)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jarswap")
    def marker(): Int = {
      val cfg = GraftConfig(
        inputPlugins = Seq.empty,
        transformPlugins = Seq(PluginConfig("plugin.jar")),
        outputPlugins = Seq.empty)
      Loader.loadPlugins(cfg, dir.resolve("config.toml"))
        .fold(e => fail(e.getMessage), identity)
        .transforms.head.execute(Seq(1L).toDF("a"))
        .fold(e => fail(e.getMessage), identity)
        .select("from_jar").collect()(0).getInt(0)
    }
    buildPluginJar(dir, marker = 42)
    assert(marker() == 42)
    // replace the jar in place; the (path, mtime, size) cache key must
    // produce a fresh classloader instead of serving the stale class
    Thread.sleep(1100) // coarse-mtime filesystems
    buildPluginJar(dir, marker = 43)
    assert(marker() == 43)
  }

  test("absolute jar paths and separator-bearing modules hit the file branch") {
    assert(Loader.isFilesystemPath("plugins/custom.jar"))
    assert(Loader.isFilesystemPath("./custom.jar"))
    assert(Loader.isFilesystemPath("/abs/custom.jar"))
    assert(Loader.isFilesystemPath("custom.jar"))
    assert(!Loader.isFilesystemPath("graft.plugins.transform.FilterPlugin"))
    assert(!Loader.isFilesystemPath("parquet_scan"))
  }

  test("missing plugin file fails like the reference (loader.py:39-41)") {
    val e = Loader.loadFromFile("nope/missing.jar", Map.empty,
      Paths.get("/tmp"), "default").left.toOption.get
    assert(e.getMessage.contains("Plugin file does not exist"))
  }

  test("a jar without BasePlugin classes fails discovery (loader.py:91-93)") {
    val dir = Files.createTempDirectory("emptyjar")
    val jarPath = dir.resolve("empty.jar")
    val jos = new JarOutputStream(Files.newOutputStream(jarPath))
    jos.close()
    val e = Loader.loadFromFile(jarPath.toString, Map.empty, dir, "default")
      .left.toOption.get
    assert(e.getMessage.contains("no BasePlugin subclasses found"))
  }

  test("a wrong-kind jar plugin is rejected by the kind check") {
    val dir = Files.createTempDirectory("jarplug2")
    buildPluginJar(dir)
    val cfg = GraftConfig(
      inputPlugins = Seq(PluginConfig("plugin.jar")), // transform in input slot
      transformPlugins = Seq.empty,
      outputPlugins = Seq.empty)
    val e = Loader.loadPlugins(cfg, dir.resolve("config.toml"))
      .left.toOption.get
    assert(e.getMessage.contains("not a valid input plugin"))
  }
}
