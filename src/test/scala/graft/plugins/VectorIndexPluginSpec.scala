package graft.plugins

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.transform._

/** similarity plugin index_build / index_query: build-once,
  * query-many through the config surface. */
class VectorIndexPluginSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark

  test("index_build passes the stream through; index_query serves it") {
    val tmp = Files.createTempDirectory("vidxplug")
    val corpus = graft.ops.SyntheticEmbeddings
      .mixtureOfGaussians(spark, n = 128, d = 16, k = 4, sigma = 0.02)
      .select(col("vec_id"), col("embedding"))
    val build = new SimilarityPlugin(Map(
      "method" -> "index_build", "id_column" -> "vec_id",
      "index_dir" -> "idx", "nlist" -> 4), tmp, "default")
    val through = build.executeWith(corpus, Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(through.count() == 128) // untouched stream
    assert(Files.exists(tmp.resolve("idx/centroids")))

    val query = new SimilarityPlugin(Map(
      "method" -> "index_query", "id_column" -> "vec_id",
      "index_dir" -> "idx", "k" -> 3, "nprobe" -> 4), tmp, "default")
    val res = query.executeWith(corpus.filter(col("vec_id") < 4), Map.empty)
      .fold(e => fail(e.getMessage), identity)
    assert(res.columns.toSeq ==
      Seq("query_id", "neighbor_id", "cosine", "rank"))
    assert(res.count() == 12) // 4 queries x k=3
    assert(new SimilarityPlugin(Map("method" -> "index_query",
      "id_column" -> "vec_id"), tmp, "x")
      .executeWith(corpus, Map.empty).left.toOption.get.getMessage
      .contains("'index_dir' is required"))
  }
}
