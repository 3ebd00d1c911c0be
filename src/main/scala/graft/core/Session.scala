package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory: local[32]-friendly defaults that are
  * also the right shape for a real cluster (AQE on, UTC, shuffle
  * partitions sized to cores locally — on a cluster AQE coalesces
  * partitions from the 32 starting point anyway). */
object Session {
  def getOrCreate(appName: String = "graft",
                  master: String = sys.env.getOrElse("SPARK_MASTER",
                    s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      : SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
