package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC-compaction scale anchor: replay the q_snapshot_upsert_compact
  * flow (two half-commits of the lineitem projection → compactUpserts
  * by a 100-way key) against a scale-fixture dir and report the
  * post-compaction file count, version bytes, and wall — the numbers
  * BASELINE.md's snapshot/CDC anchor rows record. File count must
  * track `ceil(bytes / targetFileBytes)` (SnapshotsSpec pins the
  * formula exactly at fixture size; this tool shows it holding
  * through ×10/×100 growth, which is the 100-TB question: a
  * compaction that wrote a CONSTANT file count would re-create the
  * small-files problem it exists to fix, one decade later).
  *
  * Usage: runMain graft.tools.SnapshotBench <sfDir> [targetFileBytes]
  */
object SnapshotBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: SnapshotBench <sfDir> [targetFileBytes]")
    val sfDir = args(0)
    val target = if (args.length > 1) args(1).toLong else 128L * 1024 * 1024
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("snapbench")
    val snapDir = work.resolve("snaps").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .withColumn("k", col("l_orderkey") % 100)
    val t0 = System.nanoTime()
    graft.sources.Snapshots.write(
      li.filter(col("l_orderkey") % 2 === 0), snapDir)
    graft.sources.Snapshots.write(
      li.filter(col("l_orderkey") % 2 =!= 0), snapDir)
    val tw = (System.nanoTime() - t0) / 1e9
    val before = li.count()
    def fileStats(): (Long, Long) = {
      val r = graft.sources.Snapshots.read(spark, snapDir)
        .select(col("_metadata.file_path"), col("_metadata.file_size"))
        .distinct()
        .agg(count(lit(1)).as("n"), sum("file_size").as("bytes"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    // phase 1: small-files compaction of the FULL store — the file
    // count here is the sizing question (must track ceil(bytes/target))
    val t1 = System.nanoTime()
    graft.sources.Snapshots.compact(spark, snapDir,
      targetFileBytes = target)
    val tc = (System.nanoTime() - t1) / 1e9
    val (cFiles, cBytes) = fileStats()
    // phase 2: CDC upsert compaction — state collapses to one row
    // per k (100 keys), so its file count is 1 by construction; the
    // number that matters is the wall of the keyed window over the
    // full store
    val t2 = System.nanoTime()
    graft.sources.Snapshots.compactUpserts(spark, snapDir,
      keyCols = Seq("k"),
      orderCols = Seq("l_orderkey", "l_linenumber", "l_quantity"),
      targetFileBytes = target)
    val tu = (System.nanoTime() - t2) / 1e9
    val latest = graft.sources.Snapshots.read(spark, snapDir)
    val (uFiles, _) = fileStats()
    println(f"[snap-bench] $sfDir rows_in=$before write=${tw}%.2fs " +
      f"compact=${tc}%.2fs compact_files=$cFiles compact_bytes=$cBytes " +
      f"upsert_compact=${tu}%.2fs state_rows=${latest.count()} " +
      f"state_files=$uFiles target=$target")
    // scratch hygiene: the ×100 store is tens of GB
    import java.util.Comparator
    java.nio.file.Files.walk(work)
      .sorted(Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    spark.stop()
  }
}
