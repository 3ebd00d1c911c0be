package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data
  * pipelines. `df.sample()` is seed-dependent on partitioning and not
  * reproducible across engines; these operators hash a KEY, so the
  * same row set falls out of any engine that can compute md5 — which
  * makes them exactly verifiable against the DuckDB oracle, and
  * stable across reruns/backfills at 100 TB (a re-ingested row keeps
  * its sampling fate).
  *
  * Hash: first 8 hex chars of md5(key) as an int in [0, 2^32) —
  * md5 (not xxhash64) for the same cross-engine rationale as
  * [[Text.fingerprint]]. Per-row expression, no shuffle.
  */
object Sampling {

  /** Uniform [0, 2^32) hash of a key column, identical in DuckDB via
    * ('0x' || substr(md5(key), 1, 8))::BIGINT. */
  def keyHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep rows whose key hashes into the sampling band:
    * hash / 2^32 < rate. Exact, deterministic, engine-portable. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(keyHash(col(keyCol)) < lit((rate * 4294967296.0).toLong))

  /** Cap every group at `cap` rows, choosing a deterministic uniform
    * subset: rank rows within the group by key hash and keep rank ≤
    * cap. The per-group sort is the same shuffle any groupBy pays;
    * with AQE skewed groups split fine. The standard move for
    * balancing a source-skewed corpus (one domain flooding the mix).
    */
  def stratifiedCap(df: DataFrame, groupCols: Seq[String], keyCol: String,
                    cap: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(keyHash(col(keyCol)), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= cap)
      .drop("_rk")
  }
}
