package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Persisted IVF index: build/query round trip, exactness under full
  * probe, partition pruning of unprobed lists, cross-session reuse. */
class VectorIndexSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def corpus = SyntheticEmbeddings
    .mixtureOfGaussians(spark, n = 256, d = 16, k = 8, sigma = 0.02)
    .select(col("vec_id"), col("embedding"))

  test("full probe + exact rerank reproduces brute-force top-k exactly") {
    val dir = Files.createTempDirectory("vindex").toString
    VectorIndex.build(corpus, "vec_id", "embedding", dir, nlist = 4)
    val queries = corpus.filter(col("vec_id") < 8)
    val got = VectorIndex.topK(spark, dir, queries, "vec_id", "embedding",
        k = 3, nprobe = 4, rerank = 64)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val want = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("partial probe prunes unprobed list partitions from the scan") {
    val dir = Files.createTempDirectory("vindex2").toString
    VectorIndex.build(corpus, "vec_id", "embedding", dir, nlist = 8)
    val one = corpus.filter(col("vec_id") === 0L)
    val res = VectorIndex.topK(spark, dir, one, "vec_id", "embedding",
      k = 3, nprobe = 2, rerank = 16)
    // EVERY postings scan — the int8 candidate scan AND the exact
    // re-rank read — must carry the static list_id partition filter;
    // an unfiltered re-rank join would re-open every unprobed list's
    // files and void the index's whole point
    def flat(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p.children ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case _ => Seq.empty
      })
      p +: kids.flatMap(flat)
    }
    val postingsScans = flat(res.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("postings")) => s
    }
    assert(postingsScans.nonEmpty, "no postings scan in plan")
    postingsScans.foreach { s =>
      assert(s.partitionFilters.exists(_.references.exists(
          _.name == "list_id")),
        s"postings scan missing list_id partition filter: $s")
    }
    assert(res.count() == 3)
    // probing the home cluster of a tight mixture finds true neighbors
    val brute = Similarity.bruteForceTopK(corpus, one,
        "vec_id", "embedding", k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    val gotN = res.select("neighbor_id").as[Long].collect().toSet
    assert((gotN & brute).size >= 2, s"recall too low: $gotN vs $brute")
  }

  test("append enrolls a new batch against saved centroids (no retrain)") {
    val dir = Files.createTempDirectory("vindex4").toString
    val first = corpus.filter(col("vec_id") % 2 === 0)
    val second = corpus.filter(col("vec_id") % 2 =!= 0)
    VectorIndex.build(first, "vec_id", "embedding", dir, nlist = 4)
    VectorIndex.append(second, "vec_id", "embedding", dir)
    // full probe + rerank over the merged postings == brute over ALL
    val queries = corpus.filter(col("vec_id") < 6)
    val got = VectorIndex.topK(spark, dir, queries, "vec_id", "embedding",
        k = 3, nprobe = 4, rerank = 64)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val want = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("mmrTopK diversifies a near-duplicate pool; lambda=1 is pure relevance") {
    // three clones of the query direction, one diverse mid-relevance
    // vector, one orthogonal: pure relevance returns the clones,
    // MMR at lambda=0.3 breaks out to the diverse vector at step 2
    val corpus = Seq(
      (1L, Array(0.99f, 0.141f)), (2L, Array(0.992f, 0.139f)),
      (3L, Array(0.991f, 0.14f)), (4L, Array(0.2f, 0.98f)),
      (5L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(brute.toSet == Set(1L, 2L, 3L)) // clones dominate relevance

    val diverse = Similarity.mmrTopK(corpus, queries, "vec_id", "embedding",
        k = 3, poolSize = 5, lambda = 0.3)
      .orderBy("mmr_rank").select("neighbor_id").as[Long].collect().toSeq
    assert(diverse.head == brute.head) // step 1 = best relevance
    // step 2 must break out of the clone cluster (λ=0.3 weights
    // diversity at 0.7, so the most orthogonal candidate wins)
    assert(Set(4L, 5L).contains(diverse(1)),
      s"expected a non-clone second: $diverse")

    val pure = Similarity.mmrTopK(corpus, queries, "vec_id", "embedding",
        k = 3, poolSize = 5, lambda = 1.0)
      .orderBy("mmr_rank").select("neighbor_id").as[Long].collect().toSeq
    assert(pure == brute, s"lambda=1 must reproduce relevance order: $pure")
  }

  test("a fresh read of the same directory serves queries (no rebuild)") {
    val dir = Files.createTempDirectory("vindex3").toString
    VectorIndex.build(corpus, "vec_id", "embedding", dir, nlist = 4)
    // second call never touches the corpus frame
    val res = VectorIndex.topK(spark, dir,
      Seq((999L, Array.fill(16)(0.25f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 5, nprobe = 4, rerank = 32)
    assert(res.count() == 5)
    assert(res.select(min(col("cosine"))).as[Double].head() >= -1.0)
  }
}
