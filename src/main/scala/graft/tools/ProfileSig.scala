package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Scratch A/B of the hyperplane-signature kernel: custom expression
  * vs the interpreted-HOF reference, on an exploded (×64) embeddings
  * table so the per-row kernel dominates job overhead.
  * Usage: runMain graft.tools.ProfileSig <sfDir>
  */
object ProfileSig {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .crossJoin(spark.range(64))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .repartition(32)
      .cache()
    val n = emb.count()
    println(s"rows=$n")

    def time(name: String)(body: => Any): Unit = {
      val reps = 3
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s best=${times.min}%7.3f s  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }

    // warm both paths
    emb.select(sum(Similarity.hyperplaneSignature(col("v"), 8))).collect()
    emb.select(sum(Similarity.hyperplaneSignatureHof(col("v"), 8))).collect()

    time("expr planes=8") {
      emb.select(sum(Similarity.hyperplaneSignature(col("v"), 8))).collect()
    }
    time("hof  planes=8") {
      emb.select(sum(Similarity.hyperplaneSignatureHof(col("v"), 8))).collect()
    }
    time("expr planes=16") {
      emb.select(sum(Similarity.hyperplaneSignature(col("v"), 16))).collect()
    }
    time("hof  planes=16") {
      emb.select(sum(Similarity.hyperplaneSignatureHof(col("v"), 16))).collect()
    }
    spark.stop()
  }
}
