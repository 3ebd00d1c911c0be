package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Linear-algebra preprocessing over an embedding column — the PCA /
  * whitening pass run before semantic dedup or ANN indexing (SemDeDup
  * ablations and the classic IVF recipe both whiten first; whitening
  * equalizes per-direction variance so cosine thresholds mean the
  * same thing in every direction).
  *
  * Scale shape — the whole construction touches the corpus exactly
  * twice, both passes shuffle-free:
  *  1. moments: ONE partial-aggregated pass accumulates the d×d sum
  *     of outer products plus the d-vector sum per partition
  *     (O(d²) floats of state, d=64 → 32 KB), merged log-tree to the
  *     driver. No row ever shuffles; the corpus streams through.
  *  2. the eigendecomposition runs on the DRIVER on the d×d
  *     covariance (cyclic Jacobi — deterministic, no RNG), which is
  *     O(d³) scalar work: microseconds at d=64, independent of corpus
  *     size.
  *  3. projection: the k×d basis is broadcast as literals and each
  *     row maps through a codegen'd dot-product projection —
  *     shuffle-free, same shape as [[Similarity.quantizeInt8]].
  */
object Embeddings {

  /** One-pass accumulator for `(Σ v·vᵀ, Σ v, n)` — a typed
    * `Aggregator`/`TypedColumn` (the documented extension point for
    * custom aggregation state), mergeable so Spark partial-aggregates
    * it map-side like any built-in. Buffer layout:
    * `[gram (d²) | mean-sum (d) | n]` in one `Array[Double]` so the
    * partial-agg state is a single flat allocation. */
  private final class MomentsAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Double], Array[Double]] {
    private val gsz = d * d
    def zero: Array[Double] = new Array[Double](gsz + d + 1)
    def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      require(v.length == d,
        s"embedding length ${v.length} != expected $d")
      var i = 0
      while (i < d) {
        val vi = v(i).toDouble
        var j = 0
        val off = i * d
        while (j < d) { b(off + j) += vi * v(j).toDouble; j += 1 }
        b(gsz + i) += vi
        i += 1
      }
      b(gsz + d) += 1.0
      b
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Double]): Array[Double] = r
    def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Raw corpus moments `(gram: d×d, sum: d, n)` from one
    * partial-aggregated pass. Driver result is O(d²). */
  def moments(df: DataFrame, embCol: String): (Array[Array[Double]], Array[Double], Long) = {
    val d = dim(df, embCol)
    implicit val seqEnc: Encoder[Seq[Float]] = ExpressionEncoder()
    val flat = df.select(col(embCol)).na.drop()
      .as[Seq[Float]]
      .select(new MomentsAgg(d).toColumn)
      .collect()(0)
    val gram = Array.tabulate(d, d)((i, j) => flat(i * d + j))
    (gram, flat.slice(d * d, d * d + d), flat(d * d + d).toLong)
  }

  /** The d×d Gram matrix (Σ v·vᵀ) as long-form rows `(i, j, g)` —
    * the cross-engine-checkable face of the one-pass aggregation
    * (i, j are 0-based). */
  def gramDF(df: DataFrame, embCol: String): DataFrame = {
    val spark = df.sparkSession
    val (gram, _, _) = moments(df, embCol)
    val rows = for (i <- gram.indices; j <- gram.indices)
      yield Row(i.toLong, j.toLong, gram(i)(j))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("i", LongType, nullable = false),
        StructField("j", LongType, nullable = false),
        StructField("g", DoubleType, nullable = false))))
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: returns (eigenvalues desc, eigenvectors as rows, aligned
    * with the values). No RNG, fixed sweep order — bit-stable across
    * runs, which the rerun-determinism contract of every operator
    * here requires. Sign convention: each eigenvector's
    * largest-magnitude component is positive. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = v(i).clone()
      val m = row.indices.maxBy(k => math.abs(row(k)))
      if (row(m) < 0) { var k = 0; while (k < d) { row(k) = -row(k); k += 1 } }
      row
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project the embedding column onto its top-`k` principal
    * components (covariance eigenvectors), optionally whitened
    * (each component scaled to unit variance). Appends `outCol` =
    * array<double> of length k; the input column is untouched.
    *
    * EAGER: the moments pass runs at call time (like vocab_encode's
    * vocabulary build); the projection itself is lazy. */
  def pcaProject(df: DataFrame, embCol: String, k: Int,
                 whiten: Boolean = false,
                 outCol: String = "pca"): DataFrame = {
    val d = dim(df, embCol)
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val (gram, sums, n) = moments(df, embCol)
    require(n > 1, s"need > 1 embedding row, got $n")
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      gram(i)(j) / n - mean(i) * mean(j))
    val (vals, vecs) = jacobiEigen(cov)
    val basis = vecs.take(k).zip(vals.take(k)).map { case (row, lambda) =>
      if (whiten) row.map(_ / math.sqrt(math.max(lambda, 1e-12))) else row
    }
    // one mat-vec kernel per row: the k×d basis rides inside the
    // expression node (33 KB at d=k=64) instead of a d×k literal
    // tree (which cost a 7 MB task binary + seconds of codegen
    // compile, and would not compile at all at d=768)
    df.withColumn(outCol,
      graft.expressions.MatVecProject.mat_vec_project(
        col(embCol), basis, mean))
  }

  private def dim(df: DataFrame, embCol: String): Int = {
    val first = df.select(col(embCol)).na.drop().limit(1).collect()
    require(first.nonEmpty, s"no non-null rows in '$embCol'")
    first(0).getSeq[Float](0).length
  }
}
