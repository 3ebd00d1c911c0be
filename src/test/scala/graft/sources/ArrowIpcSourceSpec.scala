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

  test("unsigned int columns widen losslessly (UInt8/16/32/64)") {
    // The reference accepts UInt8-64 (multiplier.py:67-78); Spark has
    // no unsigned types, so the bridge widens (SURVEY §1). Values
    // above the SIGNED max are the regression trap: the raw vector
    // bytes are negative two's-complement and must be masked, not
    // sign-extended.
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.{UInt1Vector, UInt2Vector, UInt4Vector,
      UInt8Vector, VectorSchemaRoot}
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType,
      Schema => ASchema}
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    val alloc = new RootAllocator()
    val fields = java.util.Arrays.asList(
      new Field("u1", FieldType.nullable(new ArrowType.Int(8, false)), null),
      new Field("u2", FieldType.nullable(new ArrowType.Int(16, false)), null),
      new Field("u4", FieldType.nullable(new ArrowType.Int(32, false)), null),
      new Field("u8", FieldType.nullable(new ArrowType.Int(64, false)), null))
    val root = VectorSchemaRoot.create(new ASchema(fields), alloc)
    root.getVector("u1").asInstanceOf[UInt1Vector].setSafe(0, 200)
    root.getVector("u2").asInstanceOf[UInt2Vector].setSafe(0, 60000)
    root.getVector("u4").asInstanceOf[UInt4Vector]
      .setSafe(0, 4000000000L.toInt) // raw bits of 4e9
    root.getVector("u8").asInstanceOf[UInt8Vector]
      .setSafe(0, java.lang.Long.parseUnsignedLong("18446744073709551610"))
    root.getVector("u1").asInstanceOf[UInt1Vector].setSafe(1, 7)
    root.getVector("u2").asInstanceOf[UInt2Vector].setSafe(1, 7)
    root.getVector("u4").asInstanceOf[UInt4Vector].setSafe(1, 7)
    root.getVector("u8").asInstanceOf[UInt8Vector].setSafe(1, 7)
    root.setRowCount(2)
    val p = Files.createTempDirectory("ipcuint").resolve("u.arrow")
    val ch = java.nio.channels.FileChannel.open(p,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val w = new ArrowFileWriter(root, null, ch)
    w.start(); w.writeBatch(); w.end(); w.close(); ch.close()
    root.close(); alloc.close()

    for (df <- Seq(ArrowIpc.readFile(p, spark),
        spark.read.format("arrow-ipc").load(p.toString))) {
      assert(df.schema.map(f => f.dataType.simpleString).toSeq ==
        Seq("smallint", "int", "bigint", "decimal(20,0)"))
      val rows = df.orderBy("u1").collect()
      assert(rows(0).getShort(0) == 7 && rows(1).getShort(0) == 200)
      assert(rows(1).getInt(1) == 60000)
      assert(rows(1).getLong(2) == 4000000000L)
      assert(rows(1).getDecimal(3) ==
        new java.math.BigDecimal("18446744073709551610"))
    }
    // the reference's only shipped transform accepts the widened
    // columns (numeric dtype whitelist, multiplier.py:67-78)
    val mult = new graft.plugins.transform.ColumnMultiplierPlugin(
      Map("column_name" -> "u2", "multiplier" -> 2),
      java.nio.file.Paths.get("/tmp"), "default")
    val out = mult.execute(ArrowIpc.readFile(p, spark))
      .fold(e => fail(e.getMessage), identity)
    assert(out.orderBy("u1").collect()(1).getInt(1) == 120000)
    assert(mult.dryRun(ArrowIpc.readFile(p, spark).schema).isRight)
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
