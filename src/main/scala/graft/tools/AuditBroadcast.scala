package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

/** Lying-estimate broadcast audit: every self-join operator is fed a
  * RANGE-ROOTED corpus (whose Catalyst size estimate stays rows×8 B
  * through every projection — no shuffle boundary below the joins, so
  * AQE never corrects it) and the INITIAL physical plan is scanned
  * for BroadcastExchange nodes. A corpus-derived broadcast under a
  * lying estimate is the scale cliff the round-12 knnGraph fix
  * removed (8 GB driver OOM at ×10, doubled ×100 wall); this tool
  * reports which other operators plan one. Bounded model tables
  * (vocab, centroids) ship as closure broadcasts, not plan-level
  * BroadcastExchange, so any hit here is a join-side broadcast.
  * Usage: runMain graft.tools.AuditBroadcast */
object AuditBroadcast {
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p.children ++ (p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Seq.empty
    }) ++ p.subqueries
    p +: kids.flatMap(flatten)
  }

  private def report(name: String, df: => DataFrame): Unit = {
    try {
      val bads = flatten(df.queryExecution.executedPlan).collect {
        case b: BroadcastExchangeExec =>
          b.output.map(a => s"${a.name}:${a.dataType.simpleString}")
            .mkString(",")
      }
      if (bads.isEmpty) println(s"[audit] $name OK (no BroadcastExchange)")
      else {
        println(s"[audit] $name BROADCASTS ${bads.size}:")
        bads.foreach(c => println(s"[audit]    [$c]"))
      }
    } catch {
      case e: Throwable =>
        println(s"[audit] $name ERROR ${e.getMessage.take(120)}")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // range-rooted corpora: the text repeats id-derived words so the
    // dedup ops have real shingles to chew on
    val docs = spark.range(0, 512).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), ((col("id") * 7 + j) % 97))): _*).as("text"))
    val emb = spark.range(0, 512).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        j => sin(col("id") * 16 + j)).as("embedding"))
    val edges = spark.range(0, 2048).select(
      (col("id") % 97).as("src"), ((col("id") * 31 + 5) % 97).as("dst"))

    import graft.ops._
    report("minhashCandidatePairs",
      Dedup.minhashCandidatePairs(docs, "doc_id", "text"))
    report("minhashCandidatePairs(star)",
      Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        maxBucket = 4, overCap = "star"))
    report("ngramJaccardVerified",
      Dedup.ngramJaccardVerified(docs, "doc_id", "text", threshold = 0.8))
    report("simhashPairs (hammingPairs)",
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3))
    report("winnowCandidatePairs",
      Dedup.winnowCandidatePairs(docs, "doc_id", "text"))
    report("embeddingCosinePairs",
      Dedup.embeddingCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.3, planes = 4, probeBits = 1))
    report("knnGraph(lsh)",
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
        method = "lsh"))
    report("Graph.pagerank",
      Graph.pagerank(edges, "src", "dst", iterations = 2))
    report("Graph.triangles",
      Graph.triangles(edges, "src", "dst"))
    spark.stop()
  }
}
