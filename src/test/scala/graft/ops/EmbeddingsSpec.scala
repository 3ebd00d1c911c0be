package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** PCA / whitening over the embedding column: moments aggregation,
  * driver-side Jacobi eigensolver, broadcast projection. */
class EmbeddingsSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  // anisotropic 3-d fixture: variance concentrated on a known axis
  private def fixture: org.apache.spark.sql.DataFrame =
    (0 until 40).map { i =>
      val t = (i - 20).toFloat
      // main axis (1, 1, 0)/sqrt2 with amplitude t, small noise on z
      (i.toLong, Seq(t, t, (i % 3 - 1).toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  test("moments: gram, mean and count match hand computation") {
    val (gram, sums, n) = Embeddings.moments(fixture, "embedding")
    assert(n == 40)
    val ts = (0 until 40).map(i => (i - 20).toDouble)
    assert(math.abs(gram(0)(0) - ts.map(t => t * t).sum) < 1e-9)
    assert(math.abs(gram(0)(1) - ts.map(t => t * t).sum) < 1e-9)
    assert(math.abs(sums(0) - ts.sum) < 1e-9)
  }

  test("jacobiEigen: recovers eigenpairs of a known symmetric matrix") {
    // A = [[2,1],[1,2]] -> eigenvalues 3 (vec (1,1)/sqrt2) and 1
    val (vals, vecs) = Embeddings.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-10 && math.abs(vals(1) - 1.0) < 1e-10)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(vecs(0)(0) - s) < 1e-10 && math.abs(vecs(0)(1) - s) < 1e-10)
    // orthonormal rows
    val dot = vecs(0).zip(vecs(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-10)
  }

  test("pcaProject: first component captures the dominant axis") {
    val out = Embeddings.pcaProject(fixture, "embedding", k = 2)
      .select(col("vec_id"), col("pca"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // row 0 has t = -20, mean t is -0.5 -> centered -19.5; its first
    // component is ±19.5*sqrt2 (projection onto (1,1,~0)/sqrt2)
    val c0 = out(0L)(0)
    assert(math.abs(math.abs(c0) - 19.5 * math.sqrt(2)) < 0.05)
    // mean of each component ~ 0 (centered)
    val m0 = out.values.map(_(0)).sum / out.size
    assert(math.abs(m0) < 1e-9)
    // deterministic across invocations
    val again = Embeddings.pcaProject(fixture, "embedding", k = 2)
      .select(col("vec_id"), col("pca"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out(7L) == again(7L))
  }

  test("pcaProject whiten: component variances normalize to ~1") {
    val out = Embeddings.pcaProject(fixture, "embedding", k = 2,
        whiten = true)
      .select(col("pca")).collect().map(_.getSeq[Double](0))
    (0 until 2).foreach { c =>
      val xs = out.map(_(c))
      val mean = xs.sum / xs.size
      val varc = xs.map(x => (x - mean) * (x - mean)).sum / xs.size
      assert(math.abs(varc - 1.0) < 1e-6, s"component $c variance $varc")
    }
  }

  test("gramDF long form matches moments; real table round numbers") {
    val g = Embeddings.gramDF(fixture, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val (gram, _, _) = Embeddings.moments(fixture, "embedding")
    assert(math.abs(g((0L, 1L)) - gram(0)(1)) < 1e-12)
    assert(g.size == 9)
  }
}
