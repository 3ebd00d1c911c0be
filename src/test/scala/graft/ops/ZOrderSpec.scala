package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.expressions.SortedBucket.sorted_bucket
import graft.expressions.ZOrderCode.zorder_code

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference Morton interleave, independent scalar spelling. */
  private def morton(dims: Seq[Int], bits: Int): Long = {
    val mask = (1 << bits) - 1
    var code = 0L
    for (c <- dims.indices; i <- 0 until bits) {
      code |= (((dims(c) & mask).toLong >> i) & 1L) << (i * dims.size + c)
    }
    code
  }

  test("zorder_code matches the scalar reference on random dims") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
    val got = rows.toDF("a", "b", "c")
      .select(zorder_code(array($"a", $"b", $"c"), 8).as("z"))
      .as[Long].collect()
    val want = rows.map { case (a, b, c) => morton(Seq(a, b, c), 8) }
    assert(got.toSeq == want)
  }

  test("zorder_code: null element clusters as bucket 0; null array is null") {
    val df = Seq(
      (Some(3), Some(5)), (None, Some(5)), (Some(3), None)
    ).toDF("a", "b")
    val got = df.select(zorder_code(array($"a", $"b"), 4).as("z"))
      .as[Long].collect()
    assert(got(0) == morton(Seq(3, 5), 4))
    assert(got(1) == morton(Seq(0, 5), 4))
    assert(got(2) == morton(Seq(3, 0), 4))
    val nul = spark.sql("SELECT zorder_code(CAST(NULL AS ARRAY<INT>), 4) AS z")
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("zorder_code: out-of-range dims are masked, not corrupting") {
    val got = Seq((257, 1)).toDF("a", "b")
      .select(zorder_code(array($"a", $"b"), 8).as("z")).as[Long].head()
    assert(got == morton(Seq(1, 1), 8))
  }

  test("sorted_bucket is the count of boundaries <= value") {
    val bs = lit(Array(10.0, 20.0, 30.0))
    val got = Seq(5.0, 10.0, 15.0, 30.0, 99.0).toDF("v")
      .select(sorted_bucket($"v", bs).as("b")).as[Int].collect().toSeq
    assert(got == Seq(0, 1, 1, 3, 3))
  }

  test("boundaries are equi-depth: buckets near-uniform on skewed data") {
    // lognormal-ish skew: equi-WIDTH bucketing would put ~all rows in
    // bucket 0; equi-depth keeps every bucket within 3x of uniform.
    val df = (1 to 4000).map(i => math.exp(i % 97 / 12.0)).toDF("v")
    val bs = ZOrder.boundaries(df, Seq("v"), bits = 4)
    val counts = ZOrder.withCode(df, Seq("v"), 4, bs, "z")
      .select(sorted_bucket($"v".cast("double"), lit(bs("v"))).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(counts.size == 16)
    val uniform = 4000.0 / 16
    assert(counts.values.forall(c => c < uniform * 3))
  }

  test("clustered write shrinks per-file ranges on BOTH dimensions") {
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(8000)((rnd.nextInt(10000), rnd.nextInt(10000)))
      .toDF("x", "y")

    def spreads(frame: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dir = Files.createTempDirectory("zorder_spec").toString
      frame.write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .select($"x", $"y", col("_metadata.file_path").as("f"))
        .groupBy("f")
        .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
        .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
      perFile
    }

    val (bx, by) = spreads(df.repartition(16))
    val (cx, cy) = spreads(ZOrder.clustered(df, Seq("x", "y"), bits = 6,
      numFiles = 16))
    // random layout: every file spans ~the full 10k range on both
    // axes; 16 files of a 64x64-bucket Z-curve must do much better
    // on x AND y simultaneously (a plain sort only helps one axis).
    assert(cx < bx * 0.5, s"x spread $cx not < half of baseline $bx")
    assert(cy < by * 0.5, s"y spread $cy not < half of baseline $by")
  }

  test("zorder_code and sorted_bucket are callable from SQL") {
    val z = spark.sql(
      "SELECT zorder_code(array(3, 5), 4) AS z, " +
        "sorted_bucket(CAST(15 AS DOUBLE), array(10.0d, 20.0d)) AS b")
      .as[(Long, Int)].head()
    assert(z == ((morton(Seq(3, 5), 4), 1)))
  }
}
