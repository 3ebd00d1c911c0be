package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** Offline A/B timing for minhash candidate-pair plan shapes (plan
  * tuning evidence; never runs in a pipeline).
  * Usage: runMain graft.tools.AbMinhash [sfDir] */
object AbMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Session.getOrCreate("graft-ab-minhash")
    spark.sparkContext.setLogLevel("WARN")

    def docs: DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(mk: => DataFrame): Unit = {
      // warm once, then 3 timed reps
      mk.queryExecution // force planning
      var best = Double.MaxValue
      (0 until 4).foreach { rep =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep > 0 && dt < best) best = dt
        if (rep == 0) println(f"$name%-28s warm=$dt%.2f rows=$n")
      }
      println(f"$name%-28s best=$best%.2f")
    }

    // current library shape
    time("lib(counts+join, melt)") {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleK = 5, numHashes = 64, bands = 16)
        .filter(col("est_jaccard") >= 0.3)
    }

    // candidate generation only (no re-attach)
    time("candidates-only") {
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64)
      val banded = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(15)), b =>
          struct(b.as("band"),
            xxhash64(array_join(transform(
              slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string")), ",")).as("bh"))))
          .as("bucket"))
        .select(col("doc_id"), col("bucket.band").as("band"), col("bucket.bh").as("bh"))
      val counts = banded.groupBy("band", "bh").count()
      val keep = counts.filter(col("count") <= 1000).drop("count")
      val capped = banded.join(keep, Seq("band", "bh"))
      capped.select(col("band"), col("bh"), col("doc_id").as("id_a"))
        .join(capped.select(col("band"), col("bh"), col("doc_id").as("id_b")),
          Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
    }

    // signature pass alone
    time("signatures-only") {
      Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64)
    }

    // old re-attach shape: two per-side joins
    time("reattach(two-joins)") {
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 5, 64)
      val banded = sig.select(col("doc_id"),
        explode(transform(sequence(lit(0), lit(15)), b =>
          struct(b.as("band"),
            xxhash64(array_join(transform(
              slice(col("sig"), b * 4 + 1, lit(4)), _.cast("string")), ",")).as("bh"))))
          .as("bucket"))
        .select(col("doc_id"), col("bucket.band").as("band"), col("bucket.bh").as("bh"))
      val counts = banded.groupBy("band", "bh").count()
      val keep = counts.filter(col("count") <= 1000).drop("count")
      val capped = banded.join(keep, Seq("band", "bh"))
      val pairs = capped.select(col("band"), col("bh"), col("doc_id").as("id_a"))
        .join(capped.select(col("band"), col("bh"), col("doc_id").as("id_b")),
          Seq("band", "bh"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      pairs
        .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.expressions.LaneAgreement.lane_agreement(
            col("sig_a"), col("sig_b")).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.3)
    }

    spark.stop()
  }
}
