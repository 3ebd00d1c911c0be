package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Wall-clock hardening (a contended sandbox once timed the driver's
  * gate out to `{}`): input tables are read once and cached
  * ([[SparkEntry.cacheInputs]]), the streaming queries share one
  * landing copy per source table, and independent queries run on a
  * small thread pool — Spark's scheduler interleaves their jobs, so
  * the wall time is bounded by work, not by 100 sequential
  * latency-bound query setups. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: SFDIR OUTDIR [queryName...] — extra args restrict the run
    // to the named queries (dev loop); the driver always passes 2.
    val sfDir = args(0); val outDir = args(1)
    val only: Set[String] = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS); Spark reads it as raw
      // nanosecond Long under this flag (no TimestampNTZ-ns type).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.cacheInputs = true
    val names = SparkEntry.queries.keys
      .filter(name => only.isEmpty || only(name)).toSeq.sorted
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "6").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val done = new java.util.concurrent.CountDownLatch(names.size)
    names.foreach { name =>
      pool.execute { () =>
        val t0 = System.nanoTime()
        // per-query wall lines make a contended/hung driver run
        // diagnosable from its stderr (which query ate the clock)
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          System.err.println(f"[verify] $name ok in " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally done.countDown()
      }
    }
    done.await()
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
