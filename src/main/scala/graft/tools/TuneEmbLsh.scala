package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Measure embeddingCosinePairs recall vs the exact cross-join pair
  * set across (planes, probeBits) — the measurement behind the
  * dedup_emb_lsh_recall gate floor (planes=4/probeBits=3 holds
  * 0.976-0.985 at threshold 0.3 across sf0.001-0.1; BASELINE.md). */
object TuneEmbLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val norm = Similarity.withNormalized(e, "embedding", "v")
        .select(col("vec_id"), col("v"))
      val a = norm.select(col("vec_id").as("id_a"), col("v").as("v_a"))
      val b = norm.select(col("vec_id").as("id_b"), col("v").as("v_b"))
      val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Similarity.dot(col("v_a"), col("v_b")).as("cosine"))
        .filter(col("cosine") >= 0.3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((planes, pb) <- Seq((2, 1), (3, 1), (3, 2), (4, 2), (4, 3))) {
        val got = Dedup.embeddingCosinePairs(e, "vec_id", "embedding",
            threshold = 0.3, planes = planes, probeBits = pb)
          .select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val hits = (exact & got).size
        println(f"$sf planes=$planes probeBits=$pb exact=${exact.size} " +
          f"recall=${hits.toDouble / exact.size}%.3f got=${got.size}")
      }
    }
    spark.stop()
  }
}
