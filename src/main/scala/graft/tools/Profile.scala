package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch profiler for operator tuning (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir> */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warm the JIT/parquet reader so first measurement isn't cold
    docs.select(graft.ops.Text.normalize(col("text")).as("_t"))
      .select(Dedup.shinglesOfNormalized(col("_t"), 5).as("sh"))
      .select(sum(size(col("sh")))).collect()

    time("shingles (staged)") {
      docs.select(graft.ops.Text.normalize(col("text")).as("_t"))
        .select(Dedup.shinglesOfNormalized(col("_t"), 5).as("sh"))
        .select(sum(size(col("sh")))).collect().head.getLong(0)
    }
    time("signatures (staged)") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64)
        .select(sum(size(col("sig")))).collect().head.getLong(0)
    }
    time("full candidate pairs") {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text").count()
    }
    time("ngram jaccard pairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.6, blockCol = Some("lang")).count()
    }
    time("simhash pairs") {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8).count()
    }
    time("fingerprint dedup") {
      Dedup.byFingerprint(docs, "doc_id", "text").count()
    }
    time("normalize only") {
      docs.select(graft.ops.Text.normalize(col("text")).as("t"))
        .select(sum(length(col("t")))).collect().head.getLong(0)
    }
    time("md5(normalize)") {
      docs.select(graft.ops.Text.fingerprint(col("text")).as("f"))
        .select(count(col("f"))).collect().head.getLong(0)
    }
    time("fingerprint noop+sort") {
      Dedup.byFingerprint(docs, "doc_id", "text").orderBy("doc_id")
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("fingerprint repart(32)") {
      Dedup.byFingerprint(docs.repartition(32), "doc_id", "text")
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("minhash pairs repart(32)") {
      Dedup.minhashCandidatePairs(docs.repartition(32), "doc_id", "text").count()
    }
    time("langid staged") {
      graft.ops.Text.withLangId(docs, "text").select(count(col("lang_guess")))
        .collect().head.getLong(0)
    }
    time("quality staged") {
      graft.ops.Text.withQualityMetrics(docs, "text")
        .select(sum(col("_praw") + col("_sraw") + col("_mraw")))
        .collect().head.getDouble(0).toLong
    }
    spark.stop()
  }
}
