package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF vector index — the deployment face of the ANN
  * family: build ONCE over the corpus, then any number of later
  * sessions query it without re-training, re-assigning or re-scanning
  * unprobed data. On disk:
  *
  *   <dir>/centroids/  (list_id, centroid array<double>) — nlist rows
  *   <dir>/postings/   PARTITIONED BY list_id:
  *       (neighbor_id, code array<int> int8-range, mn, scale,
  *        v array<double> normalized fp)
  *
  * Query path: probed list ids are ≤ nlist distinct ints (a bounded
  * collect by construction), so the postings read carries a STATIC
  * `list_id IN (...)` partition filter — a query probing
  * nprobe/nlist of the lists touches exactly that fraction of the
  * files, which is the entire point of an index at 100 TB. Candidate
  * scoring is int8 (8× skinnier than fp64); full fp vectors re-attach
  * only for the bounded exact re-rank, by joining the postings again
  * on the surviving candidate ids.
  */
object VectorIndex {

  /** Train (bounded driver sample + local Lloyd's, the FAISS shape),
    * assign, quantize, persist. Eager: runs the write jobs. */
  def build(corpus: DataFrame, idCol: String, embCol: String,
            dir: String, nlist: Int = 64): Unit = {
    require(nlist >= 1, s"nlist must be >= 1, got $nlist")
    val spark = corpus.sparkSession
    val c = Similarity.withNormalized(
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
      "_e", "v").select(col("neighbor_id"), col("v"))
    val sample = Similarity.trainingSample(c, "neighbor_id", "v")
    val centroids = KMeansLite.fit(sample, nlist, iters = 25, seed = 42L)

    import graft.expressions.NearestCentroids.nearest_centroids
    import graft.expressions.Int8Candidates.int8_code
    c.withColumn("list_id",
        element_at(nearest_centroids(col("v"), centroids, 1), 1))
      .withColumn("_q8", int8_code(col("v")))
      .select(col("list_id"), col("neighbor_id"),
        col("_q8.code").as("code"), col("_q8.mn").as("mn"),
        col("_q8.scale").as("scale"), col("v"))
      .write.mode(SaveMode.Overwrite).partitionBy("list_id")
      .parquet(s"$dir/postings")

    import spark.implicits._
    centroids.zipWithIndex
      .map { case (ctr, i) => (i, ctr.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
  }

  /** Enroll a NEW batch into an existing index without retraining:
    * assign against the SAVED centroids, quantize, append postings.
    * The incremental-ingestion contract — centroids drift only on an
    * explicit rebuild, exactly like FAISS's add-after-train. Eager. */
  def append(batch: DataFrame, idCol: String, embCol: String,
             dir: String): Unit = {
    val spark = batch.sparkSession
    val centroids: Array[Array[Double]] = spark.read
      .parquet(s"$dir/centroids").orderBy("list_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val c = Similarity.withNormalized(
      batch.select(col(idCol).as("neighbor_id"), col(embCol).as("_e")),
      "_e", "v").select(col("neighbor_id"), col("v"))
    import graft.expressions.NearestCentroids.nearest_centroids
    import graft.expressions.Int8Candidates.int8_code
    c.withColumn("list_id",
        element_at(nearest_centroids(col("v"), centroids, 1), 1))
      .withColumn("_q8", int8_code(col("v")))
      .select(col("list_id"), col("neighbor_id"),
        col("_q8.code").as("code"), col("_q8.mn").as("mn"),
        col("_q8.scale").as("scale"), col("v"))
      .write.mode(SaveMode.Append).partitionBy("list_id")
      .parquet(s"$dir/postings")
  }

  /** Top-`k` cosine neighbors of `queries` against the persisted
    * index: `(queryIdOut, neighbor_id, cosine, rank)`. */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           idCol: String, embCol: String, k: Int,
           nprobe: Int = 7, rerank: Int = 64,
           queryIdOut: String = "query_id"): DataFrame = {
    require(k >= 1 && nprobe >= 1 && rerank >= k,
      s"need k >= 1, nprobe >= 1, rerank >= k; got k=$k nprobe=$nprobe rerank=$rerank")
    val centroids: Array[Array[Double]] = spark.read
      .parquet(s"$dir/centroids").orderBy("list_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val postings = spark.read.parquet(s"$dir/postings")

    val q = Similarity.withNormalized(
      queries.select(col(idCol).as(queryIdOut), col(embCol).as("_e")),
      "_e", "v_q").select(col(queryIdOut), col("v_q"))

    import graft.expressions.NearestCentroids.nearest_centroids
    import graft.expressions.Int8Candidates.int8_dot
    val qProbed = q.withColumn("list_id",
      explode(nearest_centroids(col("v_q"), centroids, nprobe)))
      .select(col(queryIdOut), col("list_id"))

    // bounded by nlist, NOT by query count: the probed set is a set
    // of list ids — collecting it buys a static partition filter on
    // the postings scan (files of unprobed lists are never opened)
    val probed = qProbed.select(col("list_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val pruned = postings.filter(col("list_id").isin(probed: _*))

    val approx = pruned
      .select(col("neighbor_id"), col("list_id"),
        col("code"), col("mn"), col("scale"))
      .join(broadcast(qProbed), Seq("list_id"))
      .filter(col("neighbor_id") =!= col(queryIdOut))
      .join(broadcast(q), Seq(queryIdOut))
      .select(col(queryIdOut), col("neighbor_id"),
        int8_dot(col("v_q"), col("code"), col("mn"), col("scale"))
          .as("approx"))
    val survivors = Similarity.topRerank(approx, queryIdOut, rerank)
    // every survivor came from a probed list, so the exact re-rank
    // reads the PRUNED postings too — the same static list_id
    // partition filter covers both scans; joining the full postings
    // here would re-open every unprobed list's files for nothing
    Similarity.exactRerank(survivors,
      pruned.select(col("neighbor_id"), col("v").as("v_c")),
      q, queryIdOut, k)
  }
}
