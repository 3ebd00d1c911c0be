package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions function registry: every custom
  * expression must be callable from SQL and agree bit-for-bit with
  * its Column-API form (same Catalyst node underneath). */
class GraftExtensionsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("simhash64 / minhash_signature64 / char_shingles callable from SQL") {
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |  minhash_signature64(text, 3, 16) AS mh,
        |  char_shingles(text, 3) AS cs
        |FROM ext_docs""".stripMargin).collect()(0)
    val viaApi = spark.table("ext_docs").select(
      graft.expressions.SimHash64.simhash64(split(col("text"), " ")).as("sh"),
      graft.expressions.MinHashSignature64
        .minhash_signature64(col("text"), 3, 16).as("mh"),
      graft.expressions.CharShingles.char_shingles(col("text"), 3).as("cs"))
      .collect()(0)
    assert(viaSql.getLong(0) == viaApi.getLong(0))
    assert(viaSql.getSeq[Long](1) == viaApi.getSeq[Long](1))
    assert(viaSql.getSeq[String](2).sorted == viaApi.getSeq[String](2).sorted)
  }

  test("vector and jaccard kernels callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  sorted_long_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        |  lane_agreement(array(1L, 2L, 3L, 4L), array(1L, 2L, 9L, 9L)) AS la,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  vec_l2_normalize(array(3.0D, 4.0D)) AS n,
        |  hyperplane_signature64(array(1.0D, 0.0D, 0.5D, -1.0D), 4) AS hp
        |""".stripMargin).collect()(0)
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.5) < 1e-12)
    assert(r.getDouble(2) == 11.0)
    assert(math.abs(r.getSeq[Double](3).head - 0.6) < 1e-12)
    assert(r.getLong(4) >= 0L && r.getLong(4) < 16L)
  }

  test("non-literal shingle size is rejected with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT char_shingles('abc', 1 + 2)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("functions reach the sql transform plugin (config surface)") {
    Seq((1L, "aaa bbb aaa"), (2L, "ccc ddd eee"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_corpus")
    val plug = new graft.plugins.transform.SqlPlugin(
      Map("query" -> ("SELECT doc_id, simhash64(split(text, ' ')) AS sig " +
        "FROM input ORDER BY doc_id")),
      java.nio.file.Paths.get("/tmp"), "default")
    val out = plug.execute(spark.table("ext_corpus"))
      .fold(e => fail(e.getMessage), identity)
    assert(out.columns.toSeq == Seq("doc_id", "sig"))
    assert(out.count() == 2)
  }
}
