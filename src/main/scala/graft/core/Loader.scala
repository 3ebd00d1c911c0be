package graft.core

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.slf4j.LoggerFactory

/** Loaded plugin sets, replacing the reference's pluggy
  * PluginManager + hook relay (loader.py:124-147, 244-270) with a
  * plain registry — the pluggy machinery is Python-ecosystem plumbing
  * with no Scala analogue needed. */
final case class PluginRegistry(
    inputs: Seq[InputPlugin],
    transforms: Seq[TransformPlugin],
    outputs: Seq[OutputPlugin])

/** A20 — dynamic plugin loading
  * (/root/reference/packages/cryoflow-core/cryoflow_core/loader.py).
  *
  * The reference resolves a `module` string either as a filesystem path
  * to a .py file or as a dotted import, then discovers every concrete
  * `BasePlugin` subclass in the module (loader.py:21-93). The JVM
  * analogue of both branches:
  *
  *  - path-looking strings (same heuristic as loader.py:21-24: a
  *    separator, a `.jar` suffix, or a leading dot) resolve against
  *    the config directory (loader.py:27-41), load through a cached
  *    `URLClassLoader`, and every concrete `BasePlugin` class in the
  *    jar is discovered and instantiated (loader.py:75-121) — so a
  *    user ships a plugin jar and points `module` at it, no engine
  *    rebuild;
  *  - anything else is a fully-qualified class name (or built-in
  *    alias) resolved reflectively from the classpath — the dotted
  *    import branch.
  *
  * Disabled entries are skipped (loader.py:202,211,220);
  * instantiation failures are wrapped with the plugin module name
  * (loader.py:96-121).
  */
object Loader {
  private val log = LoggerFactory.getLogger(getClass)

  /** Built-in short names so configs can say `parquet_scan` instead of
    * the fully-qualified class name (mirrors the reference shipping a
    * plugin collections package). */
  val builtinAliases: Map[String, String] = Map(
    "parquet_scan" -> "graft.plugins.input.ParquetScanPlugin",
    "csv_scan" -> "graft.plugins.input.CsvScanPlugin",
    "json_scan" -> "graft.plugins.input.JsonScanPlugin",
    "ipc_scan" -> "graft.plugins.input.IpcScanPlugin",
    "orc_scan" -> "graft.plugins.input.OrcScanPlugin",
    "snapshot_scan" -> "graft.plugins.input.SnapshotScanPlugin",
    "snapshot_writer" -> "graft.plugins.output.SnapshotWriterPlugin",
    "orc_writer" -> "graft.plugins.output.OrcWriterPlugin",
    "column_multiplier" -> "graft.plugins.transform.ColumnMultiplierPlugin",
    "filter" -> "graft.plugins.transform.FilterPlugin",
    "select" -> "graft.plugins.transform.SelectPlugin",
    "drop" -> "graft.plugins.transform.DropPlugin",
    "with_column" -> "graft.plugins.transform.WithColumnPlugin",
    "cast" -> "graft.plugins.transform.CastPlugin",
    "rename" -> "graft.plugins.transform.RenamePlugin",
    "group_by_agg" -> "graft.plugins.transform.GroupByAggPlugin",
    "join" -> "graft.plugins.transform.JoinPlugin",
    "sort" -> "graft.plugins.transform.SortPlugin",
    "when_then" -> "graft.plugins.transform.WhenThenPlugin",
    "distinct" -> "graft.plugins.transform.DistinctPlugin",
    "limit" -> "graft.plugins.transform.LimitPlugin",
    "union" -> "graft.plugins.transform.UnionPlugin",
    "sql" -> "graft.plugins.transform.SqlPlugin",
    "dedup" -> "graft.plugins.transform.DedupPlugin",
    "text_analysis" -> "graft.plugins.transform.TextAnalysisPlugin",
    "gopher_filter" -> "graft.plugins.transform.GopherFilterPlugin",
    "similarity" -> "graft.plugins.transform.SimilarityPlugin",
    "percentiles" -> "graft.plugins.transform.PercentilesPlugin",
    "sample" -> "graft.plugins.transform.SamplePlugin",
    "redact_pii" -> "graft.plugins.transform.RedactPiiPlugin",
    "contamination" -> "graft.plugins.transform.ContaminationPlugin",
    "dsir" -> "graft.plugins.transform.DsirPlugin",
    "multimodal" -> "graft.plugins.transform.MultimodalPlugin",
    "sessionize" -> "graft.plugins.transform.SessionizePlugin",
    "chunk" -> "graft.plugins.transform.ChunkPlugin",
    "pack" -> "graft.plugins.transform.PackPlugin",
    "profile" -> "graft.plugins.transform.ProfilePlugin",
    "vocab_encode" -> "graft.plugins.transform.VocabEncodePlugin",
    "bpe" -> "graft.plugins.transform.BpePlugin",
    "pivot" -> "graft.plugins.transform.PivotPlugin",
    "dup_spans" -> "graft.plugins.transform.DupSpansPlugin",
    "tfidf" -> "graft.plugins.transform.TfidfPlugin",
    "bm25" -> "graft.plugins.transform.Bm25Plugin",
    "top_ngrams" -> "graft.plugins.transform.NgramsPlugin",
    "fuzzy_pairs" -> "graft.plugins.transform.FuzzyPairsPlugin",
    "interval_join" -> "graft.plugins.transform.IntervalJoinPlugin",
    "asof_join" -> "graft.plugins.transform.AsOfJoinPlugin",
    "scd2" -> "graft.plugins.transform.ScdPlugin",
    "graph" -> "graft.plugins.transform.GraphPlugin",
    "c4_filter" -> "graft.plugins.transform.C4Plugin",
    "lm_score" -> "graft.plugins.transform.LmScorePlugin",
    "classify_nb" -> "graft.plugins.transform.ClassifyNbPlugin",
    "resample" -> "graft.plugins.transform.ResamplePlugin",
    "expect" -> "graft.plugins.transform.ExpectPlugin",
    "hash_embed" -> "graft.plugins.transform.HashEmbedPlugin",
    "funnel" -> "graft.plugins.transform.FunnelPlugin",
    "cohorts" -> "graft.plugins.transform.CohortsPlugin",
    "blocklist" -> "graft.plugins.transform.BlocklistPlugin",
    "url" -> "graft.plugins.transform.UrlPlugin",
    "unpivot" -> "graft.plugins.transform.UnpivotPlugin",
    "parquet_stream_scan" -> "graft.plugins.streaming.ParquetStreamScanPlugin",
    "stream_parquet_writer" -> "graft.plugins.streaming.StreamParquetWriterPlugin",
    "stream_upsert_writer" -> "graft.plugins.streaming.StreamUpsertWriterPlugin",
    "stream_snapshot_writer" -> "graft.plugins.streaming.StreamSnapshotWriterPlugin",
    "parquet_writer" -> "graft.plugins.output.ParquetWriterPlugin",
    "csv_writer" -> "graft.plugins.output.CsvWriterPlugin",
    "json_writer" -> "graft.plugins.output.JsonWriterPlugin",
    "ipc_writer" -> "graft.plugins.output.IpcWriterPlugin",
    // Compat aliases for the reference's shipped module paths (the
    // complete cryoflow_plugin_collections surface), so an existing
    // cryoflow config — including examples/config.toml — runs on this
    // engine unmodified.
    "cryoflow_plugin_collections.input.parquet_scan" ->
      "graft.plugins.input.ParquetScanPlugin",
    "cryoflow_plugin_collections.input.csv_scan" ->
      "graft.plugins.input.CsvScanPlugin",
    "cryoflow_plugin_collections.input.ipc_scan" ->
      "graft.plugins.input.IpcScanPlugin",
    "cryoflow_plugin_collections.transform.multiplier" ->
      "graft.plugins.transform.ColumnMultiplierPlugin",
    "cryoflow_plugin_collections.output.parquet_writer" ->
      "graft.plugins.output.ParquetWriterPlugin")

  /** Instantiate one plugin class reflectively. The constructor
    * contract mirrors loader.py:96-121: (options, configDir, label). */
  def instantiate(module: String, options: Map[String, Any],
                  configDir: Path, label: String): Either[Throwable, BasePlugin] = {
    val className = builtinAliases.getOrElse(module, module)
    try {
      val cls = Class.forName(className)
      if (!classOf[BasePlugin].isAssignableFrom(cls))
        Left(new PluginLoadError(
          s"Class '$className' is not a graft plugin (must extend BasePlugin)"))
      else {
        val ctor = cls.getConstructor(
          classOf[Map[String, Any]], classOf[Path], classOf[String])
        Right(ctor.newInstance(options, configDir, label)
          .asInstanceOf[BasePlugin])
      }
    } catch {
      case e: ClassNotFoundException =>
        Left(new PluginLoadError(s"Plugin module not found: '$module'", e))
      case e: NoSuchMethodException =>
        Left(new PluginLoadError(
          s"Plugin '$className' lacks the (options, configDir, label) constructor", e))
      case scala.util.control.NonFatal(e) =>
        Left(new PluginLoadError(
          s"Failed to instantiate plugin '$module': ${e.getMessage}", e))
    }
  }

  /** Module strings that refer to a file rather than a class name —
    * mirrors `_is_filesystem_path` (loader.py:21-24, with `.jar` as
    * the JVM's `.py`). */
  private[core] def isFilesystemPath(module: String): Boolean =
    module.contains("/") || module.contains("\\") ||
      module.endsWith(".jar") || module.endsWith(".scala") ||
      module.startsWith(".")

  /** One classloader per resolved jar VERSION, shared by all config
    * entries pointing at it (like the reference's sys.modules
    * registration, loader.py:50-55) — classes from the same jar stay
    * identical. The cache key includes (lastModified, size) so a jar
    * replaced on disk mid-process gets a fresh loader instead of
    * serving stale classes. Superseded loaders are NOT closed eagerly
    * — plugin instances loaded from them may still be live, and their
    * deferred Spark plans can trigger further class/resource loads
    * mid-query — they are retired and closed together with the
    * current loaders by a JVM shutdown hook. */
  private val jarLoaders =
    scala.collection.concurrent.TrieMap.empty[(Path, Long, Long), java.net.URLClassLoader]
  private val retiredLoaders =
    new java.util.concurrent.ConcurrentLinkedQueue[java.net.URLClassLoader]()

  /** Every compiled-source output dir ever created — deleted
    * RECURSIVELY at JVM exit (File.deleteOnExit is a no-op on a
    * non-empty dir, so without this each run leaks a populated temp
    * dir to the host). */
  private val sourceOutDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  sys.addShutdownHook {
    import scala.jdk.CollectionConverters._
    (jarLoaders.values ++ sourceLoaders.values.asScala.map(_._2) ++
        retiredLoaders.asScala)
      .foreach(l => try l.close() catch { case _: Throwable => () })
    sourceOutDirs.asScala.foreach { d =>
      try Files.walk(d).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      catch { case _: Throwable => () }
    }
  }

  private def loaderFor(resolved: Path): ClassLoader = {
    val f = resolved.toFile
    val key = (resolved, f.lastModified, f.length)
    val loader = jarLoaders.getOrElseUpdate(key,
      new java.net.URLClassLoader(
        Array(resolved.toUri.toURL), getClass.getClassLoader))
    // retire cache entries for older versions of the same path (kept
    // open — see scaladoc; `remove` is atomic, so concurrent callers
    // retire an entry at most once)
    jarLoaders.keys.filter(k => k._1 == resolved && k != key).foreach { k =>
      jarLoaders.remove(k).foreach(retiredLoaders.add)
    }
    loader
  }

  /** Load EVERY concrete BasePlugin class from a plugin jar —
    * `_resolve_module_path` + `_load_module_from_path` +
    * `_discover_plugin_classes` + `_instantiate_plugins`
    * (loader.py:27-121). Top-level classes only: `$`-suffixed
    * companion/inner classes are compiler artifacts, not plugins. */
  def loadFromFile(module: String, options: Map[String, Any],
                   configDir: Path, label: String): Either[Throwable, Seq[BasePlugin]] =
    try {
      val p0 = Paths.get(module)
      val resolved = (if (p0.isAbsolute) p0
                      else configDir.resolve(p0)).normalize.toAbsolutePath
      if (!Files.exists(resolved))
        return Left(new PluginLoadError(s"Plugin file does not exist: $resolved"))
      if (resolved.toString.endsWith(".scala"))
        return loadFromSource(resolved, module, options, configDir, label)
      val loader = loaderFor(resolved)
      val jar = new java.util.jar.JarFile(resolved.toFile)
      val classNames =
        try jar.entries().asScala.map(_.getName)
          .filter(n => n.endsWith(".class") && !n.contains("$"))
          .map(n => n.stripSuffix(".class").replace('/', '.'))
          .toList
        finally jar.close()
      discoverAndInstantiate(classNames, loader, module, options,
        configDir, label)
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(new PluginLoadError(
          s"Plugin '$module': failed to load from file: ${e.getMessage}", e))
    }

  /** Discovery + instantiation shared by the jar and source-file
    * branches (loader.py:75-121): every concrete BasePlugin class,
    * constructed with the (options, configDir, label) signature. */
  private def discoverAndInstantiate(classNames: Seq[String],
      loader: ClassLoader, module: String, options: Map[String, Any],
      configDir: Path, label: String): Either[Throwable, Seq[BasePlugin]] = {
    val pluginClasses = classNames.flatMap { cn =>
      // initialize = false: don't run static init of unrelated classes
      val c = Class.forName(cn, false, loader)
      if (classOf[BasePlugin].isAssignableFrom(c) && !c.isInterface &&
          !java.lang.reflect.Modifier.isAbstract(c.getModifiers)) Some(c)
      else None
    }
    if (pluginClasses.isEmpty)
      Left(new PluginLoadError(
        s"Plugin '$module': no BasePlugin subclasses found in module"))
    else
      pluginClasses.foldLeft[Either[Throwable, Vector[BasePlugin]]](
        Right(Vector.empty)) { (acc, cls) =>
        acc.flatMap { xs =>
          try {
            val ctor = cls.getConstructor(
              classOf[Map[String, Any]], classOf[Path], classOf[String])
            Right(xs :+ ctor.newInstance(options, configDir, label)
              .asInstanceOf[BasePlugin])
          } catch {
            case scala.util.control.NonFatal(e) =>
              Left(new PluginLoadError(
                s"Plugin '$module': failed to instantiate " +
                  s"${cls.getSimpleName}: ${e.getMessage}", e))
          }
        }
      }
  }

  /** One compiled-output (dir, classloader) per source-file VERSION —
    * the `.scala` twin of [[jarLoaders]], keyed the same way so an
    * edited file recompiles on the next pipeline run while live
    * plugin instances keep their old classes. ConcurrentHashMap (not
    * TrieMap): `computeIfAbsent`'s mapping function runs at most once
    * per key, so two threads first-loading the same `.scala` can't
    * both pay the in-process compiler run and leak the losing
    * URLClassLoader (TrieMap.getOrElseUpdate evaluates the thunk in
    * every racing caller). */
  private val sourceLoaders = new java.util.concurrent.ConcurrentHashMap[
    (Path, Long, Long), (Path, java.net.URLClassLoader)]()

  /** Dynamic plugin loading from a SINGLE `.scala` source file — full
    * workflow parity with the reference loading a `.py` file at
    * runtime (loader.py:44-61): the user drops a source file next to
    * the config, points `module` at it, and the engine compiles it
    * in-process (scala-compiler ships in every Spark distribution)
    * against the running classpath, then discovers and instantiates
    * its BasePlugin classes exactly like the jar branch. Compile
    * errors surface as PluginLoadError with source positions. */
  private def loadFromSource(resolved: Path, module: String,
      options: Map[String, Any], configDir: Path,
      label: String): Either[Throwable, Seq[BasePlugin]] = {
    val f = resolved.toFile
    val key = (resolved, f.lastModified, f.length)
    val (outDir, loader) = sourceLoaders.computeIfAbsent(key, { _ =>
      val out = Files.createTempDirectory("graft_plugin_src")
      sourceOutDirs.add(out) // recursive delete in the shutdown hook
      val settings = new scala.tools.nsc.Settings()
      settings.usejavacp.value = true // the forked JVM's -cp
      // plus wherever graft.core itself lives (covers embedders whose
      // classes are NOT on java.class.path, e.g. isolated loaders)
      Option(classOf[BasePlugin].getProtectionDomain.getCodeSource)
        .map(_.getLocation.toURI).foreach { u =>
          settings.classpath.append(Paths.get(u).toString)
        }
      settings.outputDirs.setSingleOutput(out.toString)
      val reporter = new scala.tools.nsc.reporters.StoreReporter(settings)
      val global = new scala.tools.nsc.Global(settings, reporter)
      new global.Run().compile(List(resolved.toString))
      if (reporter.hasErrors) {
        val msgs = reporter.infos.filter(_.severity.id >= 2).take(5)
          .map(i => s"${i.pos.source.file.name}:${i.pos.line}: ${i.msg}")
          .mkString("; ")
        throw new PluginLoadError(
          s"Plugin '$module': compilation failed: $msgs")
      }
      (out, new java.net.URLClassLoader(
        Array(out.toUri.toURL), getClass.getClassLoader))
    })
    // retire superseded versions of the same path (see jarLoaders).
    // The retired version's outDir is NOT deleted: its classloader
    // stays open for live plugin instances whose deferred Spark plans
    // may still lazily load classes from it — same contract as
    // retired jar loaders. The leak is a few .class files per edit,
    // process-lifetime only.
    sourceLoaders.keySet.asScala
      .filter(k => k._1 == resolved && k != key)
      .foreach { k =>
        Option(sourceLoaders.remove(k)).foreach(v => retiredLoaders.add(v._2))
      }
    val walk = Files.walk(outDir)
    val classNames =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".class") &&
          !p.getFileName.toString.contains("$"))
        .map(p => outDir.relativize(p).toString
          .stripSuffix(".class").replace(java.io.File.separatorChar, '.'))
        .toList
      finally walk.close() // walk holds open DirectoryStreams
    discoverAndInstantiate(classNames, loader, module, options,
      configDir, label)
  }

  /** Load all enabled plugins from a config; first failure wins
    * (loader.py:173-231). `configPath` is the config FILE; relative
    * plugin paths resolve against its parent directory (A21). */
  def loadPlugins(config: GraftConfig,
                  configPath: Path): Either[Throwable, PluginRegistry] = {
    val configDir = Option(configPath.toAbsolutePath.getParent)
      .getOrElse(configPath.toAbsolutePath)

    // Kind-check each list: a transform class in input_plugins is a
    // config error, reported like the reference's discovery failure.
    def kindCheck(p: BasePlugin, want: Class[_], pc: PluginConfig,
                  kind: String): Either[Throwable, BasePlugin] =
      if (want.isInstance(p)) Right(p)
      else Left(new PluginLoadError(
        s"Plugin '${pc.module}' is not a valid $kind plugin"))

    def loadList(entries: Seq[PluginConfig], want: Class[_], kind: String)
        : Either[Throwable, Seq[BasePlugin]] =
      entries.filter(_.enabled)
        .foldLeft[Either[Throwable, Vector[BasePlugin]]](Right(Vector.empty)) {
          (acc, pc) =>
            acc.flatMap { xs =>
              val loaded: Either[Throwable, Seq[BasePlugin]] =
                if (isFilesystemPath(pc.module))
                  loadFromFile(pc.module, pc.options, configDir, pc.label)
                else
                  instantiate(pc.module, pc.options, configDir, pc.label)
                    .map(Seq(_))
              loaded.flatMap { ps =>
                ps.foldLeft[Either[Throwable, Vector[BasePlugin]]](
                  Right(Vector.empty)) { (a, p) =>
                  a.flatMap(v => kindCheck(p, want, pc, kind).map(v :+ _))
                }
              }.map { ps =>
                ps.foreach(p => log.info(
                  s"Loaded $kind plugin: ${p.name} (label: ${pc.label})"))
                xs ++ ps
              }
            }
        }

    for {
      ins <- loadList(config.inputPlugins, classOf[InputPlugin], "input")
      trs <- loadList(config.transformPlugins, classOf[TransformPlugin], "transform")
      outs <- loadList(config.outputPlugins, classOf[OutputPlugin], "output")
    } yield PluginRegistry(
      ins.map(_.asInstanceOf[InputPlugin]),
      trs.map(_.asInstanceOf[TransformPlugin]),
      outs.map(_.asInstanceOf[OutputPlugin]))
  }
}
