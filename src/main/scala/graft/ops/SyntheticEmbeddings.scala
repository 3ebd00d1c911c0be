package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpora for exercising the ANN
  * scale paths.
  *
  * The driver-provided `embeddings` fixture is ISOTROPIC (noise
  * around the origin): on it a recall-honest LSH/IVF configuration
  * probes nearly every bucket, so a benchmark of the bucketed paths
  * measures brute-force coverage through join machinery and says
  * nothing about the operator on real corpora. Real embedding spaces
  * are CLUSTERED (topical/semantic modes); this generator produces
  * that shape — a mixture of Gaussians around k well-separated unit
  * centers — so the bucketed paths have a tracked benchmark where
  * bucketing genuinely wins, with recall gated against the brute
  * ground truth on the same data.
  *
  * Fully deterministic and fully distributed: centers come from a
  * seeded driver RNG (k×d doubles, broadcast as a plan literal), and
  * per-row noise is Box-Muller over `xxhash64(id, coord, seed)` —
  * pure codegen'd column expressions over `spark.range(n)`, no RNG
  * state, no UDF, no data movement. The ROW generation is
  * embarrassingly parallel at any n; the CENTER table is the bound —
  * k×d doubles materialized on the driver and serialized into every
  * task's plan, so k must stay plan-literal-sized (≤ ~10⁶ cells;
  * callers that scale k with n, like the clustered bench fixture's
  * k = n/64, inherit that ceiling — beyond it, derive centers on
  * executors from a hash of the label instead of a literal).
  */
object SyntheticEmbeddings {

  /** Mixture-of-Gaussians corpus: `(vec_id, label, embedding)` with
    * `label = vec_id % k` and `embedding = center(label) + σ·N(0,I)`,
    * centers unit-normalized from a seeded Gaussian draw. With the
    * default σ=0.05 in d=64, intra-cluster cosines are ≈0.93 while
    * inter-center cosines are ≈±0.125 — unambiguous neighborhoods. */
  def mixtureOfGaussians(spark: SparkSession, n: Long, d: Int = 64,
                         k: Int = 32, sigma: Double = 0.05,
                         seed: Long = 42L): DataFrame = {
    require(n > 0 && d > 0 && k > 0 && sigma >= 0)
    // the centers literal is k×d doubles in the serialized plan —
    // fail loudly before materializing a runaway driver allocation
    // (clusteredEmb-style callers derive k from n, so guard here, at
    // the point the driver memory is actually committed)
    require(k.toLong * d <= 4_000_000L,
      s"centers literal would be $k×$d doubles — beyond the plan-" +
        "literal bound; derive centers from a label hash instead")
    val rnd = new scala.util.Random(seed)
    val centers: Seq[Seq[Double]] = Seq.fill(k) {
      val raw = Array.fill(d)(rnd.nextGaussian())
      val norm = math.sqrt(raw.map(x => x * x).sum).max(1e-12)
      raw.map(_ / norm).toSeq
    }
    val centersLit = typedlit(centers)
    val label = (col("vec_id") % k).cast("int")
    val twoTo53 = 9007199254740992.0
    def unit(j: org.apache.spark.sql.Column, salt: Long) = // (0, 1]
      (shiftrightunsigned(xxhash64(col("vec_id"), j, lit(seed + salt)), 11)
        .cast("double") + lit(1.0)) / lit(twoTo53)
    val emb = transform(sequence(lit(0), lit(d - 1)), { j =>
      val g = sqrt(lit(-2.0) * log(unit(j, 1))) *
        cos(lit(2.0 * math.Pi) * unit(j, 2))
      (element_at(element_at(centersLit, label + 1), j + 1) +
        lit(sigma) * g).cast("float")
    })
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("label", label)
      .withColumn("embedding", emb)
  }
}
