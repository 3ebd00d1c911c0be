package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampType}

import graft.expressions.SortedBucket.sorted_bucket
import graft.expressions.ZOrderCode.zorder_code

/** Multi-dimensional write clustering along the Z (Morton) curve.
  *
  * Single-column sort-on-write tightens parquet min/max stats for the
  * leading column only; queries filtering on the SECOND clustered
  * column still scan every row group. Z-ordering interleaves the
  * bucketed dimensions into one code so that sorting by the code keeps
  * rows close in EVERY clustered dimension — the standard lakehouse
  * layout move (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) rebuilt
  * on plain parquet.
  *
  * Pipeline shape, and why it scales:
  *  1. one sampled pass (`approxQuantile`, all columns at once) →
  *     2^bits − 1 equi-depth boundaries per column on the driver —
  *     bounded at a few KB regardless of table size, same bounded-
  *     driver-state pattern as IVF centroid training;
  *  2. per-row bucket + interleave via two primitive expressions
  *     ([[graft.expressions.SortedBucket]] /
  *     [[graft.expressions.ZOrderCode]]) — no shuffle;
  *  3. `repartitionByRange` on the code (the ONE shuffle — replacing,
  *     not adding to, the repartition a layout-aware write already
  *     pays) + `sortWithinPartitions` so files AND row groups within
  *     files are code-contiguous.
  *
  * Equi-depth (not equi-width) bucketing makes the layout robust to
  * skew: a heavy-hitter value occupies many buckets' worth of rows but
  * cannot drag the whole range into one bucket. Non-numeric columns
  * are hashed first (xxhash64) — clustering then acts as a uniform
  * spreader for them, which preserves point-lookup pruning (equal
  * values share buckets) though not range pruning.
  */
object ZOrder {

  /** Equi-depth boundaries for each column, one sampled pass total.
    * Null-safe: approxQuantile ignores nulls; an all-null or constant
    * column yields degenerate boundaries, which SortedBucket maps to a
    * single bucket — harmless for layout. */
  def boundaries(df: DataFrame, cols: Seq[String], bits: Int,
                 relativeError: Double = 0.001): Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 21, s"bits must be in [1, 21], got $bits")
    val nb = (1 << bits) - 1
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val asDouble = cols.map(c => numericized(df, c).cast("double").as(c))
    val qs = df.select(asDouble: _*)
      .stat.approxQuantile(cols.toArray, probs, relativeError)
    cols.zip(qs.map(_.sorted)).toMap
  }

  /** The column as something bucketable: numeric/date/timestamp pass
    * through (cast to double by the caller); anything else hashes. */
  private def numericized(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case _: NumericType | DateType | TimestampType => col(c)
      case _ => xxhash64(col(c))
    }

  /** Adds the interleaved code column; no shuffle, no action.
    * `curve` = "z" (Morton, any k) | "hilbert" (k >= 2 dims,
    * tighter locality — see [[graft.expressions.HilbertCode]]). */
  def withCode(df: DataFrame, cols: Seq[String], bits: Int,
               bounds: Map[String, Array[Double]],
               codeCol: String = "_zcode",
               curve: String = "z"): DataFrame = {
    require(cols.nonEmpty, "cluster columns must be non-empty")
    require(cols.size * bits <= 63,
      s"${cols.size} dims x $bits bits exceeds 63 output bits")
    val dims = cols.map { c =>
      val bs = lit(bounds(c))
      coalesce(sorted_bucket(numericized(df, c).cast("double"), bs), lit(0))
    }
    curve match {
      case "z" => df.withColumn(codeCol, zorder_code(array(dims: _*), bits))
      case "hilbert" =>
        require(cols.size >= 2,
          s"hilbert curve requires >= 2 cluster columns, got ${cols.size}")
        df.withColumn(codeCol,
          graft.expressions.HilbertCode.hilbert_code(array(dims: _*), bits))
      case other =>
        throw new IllegalArgumentException(
          s"curve must be 'z' or 'hilbert', got '$other'")
    }
  }

  /** Full layout transform: code → range-shuffle → local sort → drop.
    * `numFiles` bounds output file count (range partitioning keeps
    * them near-equal-sized by construction — the sampled range
    * boundaries are equi-depth over the code). */
  def clustered(df: DataFrame, cols: Seq[String], bits: Int = 8,
                numFiles: Int = 0, curve: String = "z"): DataFrame = {
    val bs = boundaries(df, cols, bits)
    val coded = withCode(df, cols, bits, bs, curve = curve)
    val ranged =
      if (numFiles > 0) coded.repartitionByRange(numFiles, col("_zcode"))
      else coded.repartitionByRange(col("_zcode"))
    ranged.sortWithinPartitions("_zcode").drop("_zcode")
  }
}
