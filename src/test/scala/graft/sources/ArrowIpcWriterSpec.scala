package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.output.IpcWriterPlugin

/** The arrow-ipc DataSourceV2 WRITE path: the distributed mirror of
  * the batch-per-split read. The structural scale proof is the part
  * file count — one per task partition — which the old driver-side
  * `ArrowIpc.writeFile` (collect + single file) can never produce;
  * rows stream through executor tasks in bounded record batches and
  * the driver touches metadata only. */
class ArrowIpcWriterSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("writes one part file per task partition (no driver materialization)") {
    val dir = Files.createTempDirectory("ipcw").resolve("out.arrow")
    val df = spark.range(0, 1000).repartition(8)
      .select($"id", concat(lit("row_"), $"id").as("name"))
    df.write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    val parts = ArrowIpcSource.resolvePaths(dir.toString)
    assert(parts.size == 8,
      s"expected one part file per partition, got ${parts.size}: $parts")
    val back = spark.read.format("arrow-ipc").load(dir.toString)
    assert(back.count() == 1000L)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 1000L).sum)
  }

  test("large frame streams through tasks in bounded record batches") {
    // row-count parameterized: at this size a driver-side collect would
    // allocate every row at once; the DSv2 path holds at most
    // batch_rows rows of Arrow buffers per task, independent of n.
    val n = sys.env.getOrElse("GRAFT_IPC_ROWS", "300000").toLong
    val dir = Files.createTempDirectory("ipcbig").resolve("big.arrow")
    val df = spark.range(0, n).repartition(16)
      .select($"id", md5(concat(lit("salt"), $"id")).as("digest"),
        ($"id" % 7 === 0).as("flag"))
    df.write.format("arrow-ipc").mode("overwrite")
      .option("batch_rows", "8192").save(dir.toString)
    val back = spark.read.format("arrow-ipc").load(dir.toString)
    assert(back.count() == n)
    assert(back.agg(sum("id")).head.getLong(0) == n * (n - 1) / 2)
    // batch_rows bounds each record batch, so splits per file > 1
    assert(back.rdd.getNumPartitions >= 16,
      "each record batch should be its own read split")
  }

  test("all supported types and nulls roundtrip through the DSv2 writer") {
    val dir = Files.createTempDirectory("ipctypes").resolve("t.arrow")
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(true),
        Some(java.sql.Date.valueOf("2024-03-01")),
        Some(java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789")),
        Some(Array[Byte](1, 2, 3))),
      (2L, None, None, None, None, None, None)
    ).toDF("id", "s", "d", "b", "dt", "ts", "bin")
      .withColumn("f", $"d".cast("float"))
      .withColumn("i32", $"id".cast("int"))
      .withColumn("i16", $"id".cast("short"))
    df.write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    val back = spark.read.format("arrow-ipc").load(dir.toString)
    assert(back.schema == df.schema)
    def norm(r: org.apache.spark.sql.Row): Seq[Any] =
      r.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }
    val a = df.orderBy("id").collect().map(norm).toSeq
    val b = back.orderBy("id").collect().map(norm).toSeq
    assert(a == b)
  }

  test("overwrite mode truncates previous part files") {
    val dir = Files.createTempDirectory("ipcow").resolve("o.arrow")
    spark.range(0, 100).repartition(4).toDF("id")
      .write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    assert(ArrowIpcSource.resolvePaths(dir.toString).size == 4)
    spark.range(0, 10).repartition(1).toDF("id")
      .write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    val parts = ArrowIpcSource.resolvePaths(dir.toString)
    assert(parts.size == 1, s"stale part files survived overwrite: $parts")
    assert(spark.read.format("arrow-ipc").load(dir.toString).count() == 10L)
  }

  test("append mode adds part files without clearing existing ones") {
    val dir = Files.createTempDirectory("ipcap").resolve("a.arrow")
    spark.range(0, 50).repartition(2).toDF("id")
      .write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    spark.range(50, 80).repartition(2).toDF("id")
      .write.format("arrow-ipc").mode("append").save(dir.toString)
    val back = spark.read.format("arrow-ipc").load(dir.toString)
    assert(back.count() == 80L)
    assert(back.select("id").distinct().count() == 80L)
  }

  test("ipc_writer plugin single_file=true produces exactly one IPC FILE at output_path") {
    val work = Files.createTempDirectory("ipcsingle")
    val p = work.resolve("exact.arrow")
    val df = spark.range(0, 200).repartition(4)
      .select($"id", concat(lit("v"), $"id").as("v"))
    new IpcWriterPlugin(
      Map("output_path" -> p.toString, "single_file" -> "true"), work, "default")
      .execute(df).fold(e => throw e, identity)
    assert(Files.isRegularFile(p), s"$p should be a single IPC file, not a directory")
    // readable both by the DSv2 source and the driver-side bridge
    assert(spark.read.format("arrow-ipc").load(p.toString).count() == 200L)
    assert(graft.plugins.input.ArrowIpc.readFile(p, spark).count() == 200L)
  }

  test("empty frame writes a readable schema-only dataset") {
    val dir = Files.createTempDirectory("ipcempty").resolve("e.arrow")
    val df = spark.range(0, 10).toDF("id").filter($"id" < 0)
      .select($"id", lit("x").as("s"))
    df.write.format("arrow-ipc").mode("overwrite").save(dir.toString)
    val back = spark.read.format("arrow-ipc").load(dir.toString)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(back.count() == 0L)
  }
}
