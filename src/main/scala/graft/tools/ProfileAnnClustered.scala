package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the clustered-fixture ANN scale paths (not
  * part of the driver contract). Times each `*_clustered` bench query
  * warm (best of 2 after a warmup pass), matching Bench methodology.
  * Usage: runMain graft.tools.ProfileAnnClustered <sfDir> */
object ProfileAnnClustered {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val names = Seq("sim_knn_brute_clustered", "sim_knn_lsh_clustered",
      "sim_topk_ivf_clustered", "sim_topk_ivfpq_clustered")
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.benchOnly(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm
    names.foreach { n =>
      val t = math.min(once(n), once(n))
      println(f"$n%-28s $t%8.2f s")
    }
    // exact recall of the benched LSH config vs the brute truth
    import org.apache.spark.sql.functions._
    val truth = graft.SparkEntry.benchOnly("sim_knn_brute_clustered")(spark, sfDir)
      .select("query_id", "neighbor_id")
    val approx = graft.SparkEntry.benchOnly("sim_knn_lsh_clustered")(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("_hit"))
    val row = truth.join(approx, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("possible"),
        sum(coalesce(col("_hit"), lit(0))).as("hits")).head()
    println(f"lsh recall@5 = ${row.getLong(1).toDouble / row.getLong(0)}%.4f")
    spark.stop()
  }
}
