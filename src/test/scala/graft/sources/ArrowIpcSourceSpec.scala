package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.input.ArrowIpc

/** The arrow-ipc DataSourceV2: distributed batch-per-split reads must
  * match the driver-side bridge ([[ArrowIpc.readFile]]) value-for-
  * value, plan one partition per record batch, and push column
  * pruning into the scan. */
class ArrowIpcSourceSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def writeSample(batchRows: Int): java.nio.file.Path = {
    val df = (1L to 100L).map(i =>
        (i, s"item_$i", i * 1.5, i % 2 == 0))
      .toDF("amount", "item", "ratio", "flag")
    val p = Files.createTempDirectory("ipcv2").resolve("data.arrow")
    ArrowIpc.writeFile(df, p, batchRows)
    p
  }

  test("reads match the driver-side bridge, across multiple batches") {
    val p = writeSample(batchRows = 17) // 100 rows -> 6 uneven batches
    val v2 = spark.read.format("arrow-ipc").load(p.toString)
    val bridge = ArrowIpc.readFile(p, spark)
    assert(v2.schema == bridge.schema)
    val a = v2.orderBy("amount").collect().map(_.toSeq)
    val b = bridge.orderBy("amount").collect().map(_.toSeq)
    assert(a.length == 100 && a.sameElements(b))
  }

  test("plans one input partition per record batch") {
    val p = writeSample(batchRows = 25) // exactly 4 batches
    val v2 = spark.read.format("arrow-ipc").load(p.toString)
    assert(v2.rdd.getNumPartitions == 4)
    // single-batch file -> single partition
    val p1 = writeSample(batchRows = 1000)
    assert(spark.read.format("arrow-ipc").load(p1.toString)
      .rdd.getNumPartitions == 1)
  }

  test("column pruning reaches the scan (ReadSchema shows projected cols)") {
    val p = writeSample(batchRows = 50)
    val pruned = spark.read.format("arrow-ipc").load(p.toString)
      .select("item")
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("ReadSchema: struct<item:string>"),
      s"expected pruned ReadSchema in:\n$physical")
    assert(pruned.collect().length == 100)
  }

  test("reads a directory of IPC files as one table") {
    val dir = Files.createTempDirectory("ipcdir")
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("amount", "item")
    val df2 = Seq((3L, "c")).toDF("amount", "item")
    ArrowIpc.writeFile(df1, dir.resolve("part0.arrow"))
    ArrowIpc.writeFile(df2, dir.resolve("part1.arrow"))
    val all = spark.read.format("arrow-ipc").load(dir.toString)
    assert(all.orderBy("amount").select("item").as[String].collect().toSeq ==
      Seq("a", "b", "c"))
    assert(all.rdd.getNumPartitions == 2)
  }

  test("reads the reference's Polars-written Utf8View file") {
    val ipc = java.nio.file.Paths.get(
      "/root/reference/examples/data/sample_sales.ipc")
    assume(Files.exists(ipc))
    val v2 = spark.read.format("arrow-ipc").load(ipc.toString)
    val viaParquet = spark.read.parquet(
      "/root/reference/examples/data/sample_sales.parquet")
    assert(v2.schema == viaParquet.schema)
    assert(v2.count() == viaParquet.count())
    assert(v2.agg(sum("total_amount")).collect()(0).getLong(0) ==
      viaParquet.agg(sum("total_amount")).collect()(0).getLong(0))
  }
}
