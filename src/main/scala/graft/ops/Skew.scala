package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for big⋈big equi-joins.
  *
  * AQE's skew-join split (on by default) handles most cases at
  * runtime; explicit salting remains the tool when a handful of hot
  * keys dominate so heavily that even split partitions overwhelm a
  * task, or when AQE is unavailable (streaming joins). Mechanics:
  * scatter the skewed side across `salts` sub-keys by a deterministic
  * per-row hash, replicate the other side once per salt, join on
  * (keys + salt). The hot key's rows now land on `salts` tasks
  * instead of one; the price is a `salts`× blow-up of the replicated
  * side — use when that side is the (relatively) smaller one.
  */
object Skew {

  /** `left` is the skewed side; `rowId` any left column unique-ish
    * per row (drives the deterministic scatter). Result equals
    * `left.join(right, keys, "inner")` exactly. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 rowId: String, salts: Int = 8): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(rowId)), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight, keys :+ "_salt").drop("_salt")
  }
}
