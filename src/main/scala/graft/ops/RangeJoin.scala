package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs on matching keys whose times lie
  * within `tolerance` of each other — the second time-series join
  * Spark lacks (alongside [[AsOfJoin]]).
  *
  * A naive `|lt - rt| <= tol` predicate plans as a nested-loop join —
  * O(n×m) per key. Bucketization makes it an equi-join: bucket both
  * sides by floor(t / tol); any qualifying pair's buckets differ by at
  * most 1, so replicating the RIGHT side into its bucket ± 1 (3 narrow
  * rows) and equi-joining on (keys, bucket) finds every candidate,
  * then the exact predicate filters. Shuffle is O(n + 3m) rows keyed
  * by (keys, bucket) — co-partitioned, AQE-skew-splittable, never
  * all-pairs.
  */
object RangeJoin {

  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTime: String, rightTime: String,
             tolerance: Long): DataFrame = {
    require(tolerance > 0)
    val lb = left.withColumn("_bucket",
      floor(col(leftTime).cast("long") / tolerance).cast("long"))
    val rb = right.withColumn("_bucket0",
      floor(col(rightTime).cast("long") / tolerance).cast("long"))
      .withColumn("_bucket",
        explode(array(col("_bucket0") - 1, col("_bucket0"), col("_bucket0") + 1)))
      .drop("_bucket0")
    lb.join(rb, keys :+ "_bucket")
      .filter(abs(col(leftTime).cast("long") - col(rightTime).cast("long"))
        <= tolerance)
      .drop("_bucket")
  }
}
