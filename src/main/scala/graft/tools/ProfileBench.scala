package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run named bench queries (same session config and
  * noop-write materialization as [[graft.Bench]]) with per-query
  * cold/warm timings, so driver-bench regressions can be reproduced
  * in isolation. Usage:
  *   runMain graft.tools.ProfileBench <sfDir> <query> [query ...]
  */
object ProfileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else graft.Bench.headline
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val inventory = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      inventory(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { n =>
      val cold = once(n)
      val warm1 = once(n)
      val warm2 = once(n)
      println(f"$n%-28s cold=$cold%7.2f warm=$warm1%7.2f / $warm2%7.2f s")
    }
    spark.stop()
  }
}
