package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantifies what `cluster_by` (Z-order) buys at read time: writes
  * lineitem under three layouts — unclustered, single-column sorted,
  * Z-ordered — then, for a 2-D box predicate on (l_partkey,
  * l_suppkey), counts how many output FILES have a min/max range
  * overlapping the box, i.e. how many a stats-pruning reader must
  * touch (file-level granularity; row-group pruning inside files
  * compounds the effect).
  *
  * Usage: runMain graft.tools.MeasureZOrder [sfDir] [files]
  */
object MeasureZOrder {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = if (args.length > 1) args(1).toInt else 16
    val spark = graft.core.Session.getOrCreate("graft-zorder-measure")
    import spark.implicits._

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val (pLo, pHi) = {
      val r = li.agg(min("l_partkey"), max("l_partkey")).as[(Long, Long)].head()
      r
    }
    val (sLo, sHi) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long)].head()
    // a 10% × 10% box in the middle of both key ranges
    def box(lo: Long, hi: Long): (Long, Long) = {
      val w = hi - lo
      (lo + (w * 0.45).toLong, lo + (w * 0.55).toLong)
    }
    val (pa, pb) = box(pLo, pHi)
    val (sa, sb) = box(sLo, sHi)

    def measure(layout: DataFrame, name: String): Unit = {
      val dir = java.nio.file.Files.createTempDirectory(s"zm_$name").toString
      layout.write.mode("overwrite").parquet(dir)
      val stats = spark.read.parquet(dir)
        .select(col("_metadata.file_path").as("f"),
          col("l_partkey"), col("l_suppkey"))
        .groupBy("f")
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .collect()
      val total = stats.length
      val xSlice = stats.count(r =>
        r.getLong(2) >= pa && r.getLong(1) <= pb)
      val ySlice = stats.count(r =>
        r.getLong(4) >= sa && r.getLong(3) <= sb)
      val box = stats.count(r =>
        r.getLong(2) >= pa && r.getLong(1) <= pb &&
          r.getLong(4) >= sa && r.getLong(3) <= sb)
      println(f"$name%-12s x-slice $xSlice%3d/$total%-3d  " +
        f"y-slice $ySlice%3d/$total%-3d  box $box%3d/$total%-3d")
    }

    println(s"predicates: x = l_partkey in [$pa,$pb], " +
      s"y = l_suppkey in [$sa,$sb] (each 10% of its key range); " +
      s"$nFiles files per layout; cells = files a min/max-pruning " +
      "reader must touch")
    measure(li.repartition(nFiles), "random")
    measure(
      li.repartitionByRange(nFiles, col("l_partkey"))
        .sortWithinPartitions("l_partkey"), "sorted-x")
    measure(
      graft.ops.ZOrder.clustered(li, Seq("l_partkey", "l_suppkey"),
        bits = 8, numFiles = nFiles), "z-ordered")
    measure(
      graft.ops.ZOrder.clustered(li, Seq("l_partkey", "l_suppkey"),
        bits = 8, numFiles = nFiles, curve = "hilbert"), "hilbert")
    spark.stop()
  }
}
