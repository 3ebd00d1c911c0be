package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: candidate-pair and shingle-mass statistics for the
  * minhash-blocked exact verifier at a fixture — the numbers behind
  * the BASELINE.md scale-anchor analysis (candidate count is the
  * verify stage's row multiplier; avg shingles/doc is its per-row
  * payload). Usage: runMain graft.tools.PairStats <sfDir> */
object PairStats {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: PairStats <sfDir>")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val n = docs.count()
    val (pairs, _) = graft.ops.Dedup.minhashCandidateIdPairs(
      docs, "doc_id", "text", shingleK = 5, numHashes = 64,
      bands = 16, maxBucket = 1000, overCap = "drop")
    val nPairs = pairs.count()
    val sh = docs
      .select(graft.ops.Text.normalize(col("text")).as("_t"))
      .select(size(graft.ops.Dedup.shinglesOfNormalized(col("_t"), 5))
        .as("ns"))
      .agg(avg(col("ns")).as("avg"), max(col("ns")).as("mx")).head()
    println(s"[pair-stats] docs=$n candidates=$nPairs " +
      f"avg_shingles=${sh.getDouble(0)}%.0f " +
      s"max_shingles=${sh.get(1)}")
    spark.stop()
  }
}
