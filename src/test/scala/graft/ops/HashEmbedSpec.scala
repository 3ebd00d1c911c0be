package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Feature-hashing embeddings: independent scalar reference, unit
  * norm, identical-text collision, ANN integration. */
class HashEmbedSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  /** Independent md5-based reference for one token. */
  private def hashOf(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("vector matches the scalar hashing-trick reference") {
    val d = 4
    val out = Seq((1L, "x x y")).toDF("doc_id", "text")
    val got = HashEmbed.embed(out, "doc_id", "text", d)
      .select("embedding").as[Seq[Double]].head()
    val raw = Array.fill(d)(0.0)
    for (t <- Seq("x", "x", "y")) {
      val h = hashOf(t)
      val sign = if ((h / d) % 2 == 0) 1.0 else -1.0
      raw((h % d).toInt) += sign
    }
    val nn = math.sqrt(raw.map(x => x * x).sum)
    val want = if (nn == 0) raw.toSeq else raw.map(_ / nn).toSeq
    assert(got == want)
  }

  test("unit norm (or exact zero); identical texts collide exactly") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val em = HashEmbed.embed(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(em(1L) == em(2L)) // same text -> bit-identical vector
    em.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-12)
    }
    // the hashed vectors feed the ANN family directly: identical
    // docs are each other's top neighbor at cosine 1
    val knn = Similarity.bruteForceTopK(
      HashEmbed.embed(docs, "doc_id", "text", 16),
      HashEmbed.embed(docs.filter($"doc_id" === 1L), "doc_id", "text", 16),
      "doc_id", "embedding", k = 1).collect()(0)
    assert(knn.getLong(1) == 2L && math.abs(knn.getDouble(2) - 1.0) < 1e-12)
  }

  test("empty-normalized docs drop; dim bounds enforced") {
    val docs = Seq((1L, "word"), (2L, "...")).toDF("doc_id", "text")
    assert(HashEmbed.embed(docs, "doc_id", "text", 8).count() == 1)
    val err = intercept[IllegalArgumentException] {
      HashEmbed.embed(docs, "doc_id", "text", 1)
    }
    assert(err.getMessage.contains("[2, 4096]"))
  }
}
