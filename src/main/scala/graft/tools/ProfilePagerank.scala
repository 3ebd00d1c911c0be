package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pagerank bench query: times the edge
  * build, setup actions, and each iteration separately so loop-cost
  * regressions can be localized. Usage:
  *   runMain graft.tools.ProfilePagerank <sfDir> [iterations]
  */
object ProfilePagerank {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val interval = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e0 = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val ep = timed("edge build + persist") {
      val p = e.select(col("src").as("_src"), col("dst").as("_dst"))
        .repartition(col("_src"))
        .persist()
      p.count(); p
    }
    val nodes = timed("nodes distinct + persist") {
      val p = ep.select(col("_src").as("node"))
        .union(ep.select(col("_dst").as("node"))).distinct().persist()
      p.count(); p
    }
    val n = nodes.count()
    val outdeg = timed("outdeg + persist") {
      val p = ep.groupBy("_src").agg(count(lit(1)).as("_deg")).persist()
      p.count(); p
    }
    var ranks = timed("rank init") {
      val p = nodes.withColumn("rank", lit(1.0 / n)).persist()
      p.count(); p
    }
    (0 until iters).foreach { it =>
      val contrib = ep
        .join(outdeg, Seq("_src"))
        .join(ranks.withColumnRenamed("node", "_src"), Seq("_src"))
        .groupBy(col("_dst").as("node"))
        .agg(sum(col("rank") / col("_deg")).as("_c"))
      val dangling = ranks.join(
          outdeg.select(col("_src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
      val nextBase = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit(0.15 / n) + lit(0.85) *
            (coalesce(col("_c"), lit(0.0)) + col("_dm") / n)).as("rank"))
      val boundary = (it + 1) % interval == 0 || it + 1 == iters
      val next = timed(s"iter $it (boundary=$boundary)") {
        if (boundary) nextBase.localCheckpoint(eager = true)
        else { val p = nextBase.persist(); p.count(); p }
      }
      ranks.unpersist(blocking = false)
      ranks = next
    }
    timed("final collect")(ranks.count())
    spark.stop()
  }
}
