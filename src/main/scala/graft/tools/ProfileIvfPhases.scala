package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition for sim_topk_ivf_clustered (round-14 verdict
  * task 2): times the synthetic-fixture materialization, the
  * training sample + driver KMeansLite fit, the assignment scan, and
  * the full query separately, warm, so an out-of-band reading can be
  * attributed to a phase instead of guessed at.
  * Usage: runMain graft.tools.ProfileIvfPhases [sfDir] */
object ProfileIvfPhases {
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

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }

    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count() * 8
    val e = graft.ops.SyntheticEmbeddings.mixtureOfGaussians(
      spark, n = n, k = math.toIntExact(n / 64).max(32), sigma = 0.03)

    // warm everything once
    graft.ops.Similarity.ivfTopK(e, e.filter(col("vec_id") < 32),
      "vec_id", "embedding", k = 5, nlist = 32, nprobe = 4)
      .write.format("noop").mode("overwrite").save()

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("fixture_materialize") {
        e.write.format("noop").mode("overwrite").save()
      }
      // the training path ivfTopK runs internally, re-spelled here:
      // normalized corpus -> bounded hash-ordered sample -> local fit
      val c = e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_e"))
      val sample = time("training_sample") {
        graft.ops.Similarity.trainingSample(
          graft.ops.Similarity.withNormalized(c, "_e", "v_c")
            .select(col("neighbor_id"), col("v_c")),
          "neighbor_id", "v_c")
      }
      val centroids = time("kmeans_fit_driver") {
        graft.ops.KMeansLite.fit(sample, 32, iters = 25, seed = 42L)
      }
      time("assign_scan") {
        import graft.expressions.NearestCentroids.nearest_centroids
        graft.ops.Similarity.withNormalized(c, "_e", "v_c")
          .select(col("neighbor_id"), col("v_c"))
          .withColumn("list_id",
            element_at(nearest_centroids(col("v_c"), centroids, 1), 1))
          .write.format("noop").mode("overwrite").save()
      }
      // round-15 sub-chain decomposition: the approx candidate scan
      // (int8 bucket join + scoring) and the rerank tail, timed
      // separately through the package-private seams, so the
      // full_query residual is attributed instead of guessed at
      time("approx_scan") {
        graft.ops.Similarity.ivfApproxForProfile(e,
            e.filter(col("vec_id") < 32), "vec_id", "embedding",
            nlist = 32, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
      }
      if (pass == 1) {
        val nCand = graft.ops.Similarity.ivfApproxForProfile(e,
          e.filter(col("vec_id") < 32), "vec_id", "embedding",
          nlist = 32, nprobe = 4).count()
        println(f"approx_rows              $nCand%9d")
      }
      time("full_query") {
        graft.ops.Similarity.ivfTopK(e, e.filter(col("vec_id") < 32),
          "vec_id", "embedding", k = 5, nlist = 32, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
