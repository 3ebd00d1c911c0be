package graft.plugins

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.output.ParquetWriterPlugin

/** Bucketed writes co-locate join keys at write time: a join of two
  * tables bucketed on the same key plans with ZERO shuffle exchanges
  * — the decisive layout optimization for repeated fact⋈fact joins
  * at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables plans without shuffle exchanges") {
    val dir = Paths.get("/tmp")
    val wh = Files.createTempDirectory("bucketwh")
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"name_$i")).toDF("k", "name")

    def write(df: org.apache.spark.sql.DataFrame, tbl: String): Unit = {
      val plug = new ParquetWriterPlugin(Map(
        "output_path" -> wh.resolve(tbl).toString,
        "bucket_by" -> Seq("k"), "buckets" -> 8, "table" -> tbl), dir, "default")
      assert(plug.execute(df).isRight, s"bucketed write of $tbl failed")
    }
    write(facts, "b_facts")
    write(dims, "b_dims")

    val joined = spark.table("b_facts").join(spark.table("b_dims"), Seq("k"))
    assert(joined.count() == 1000)

    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"expected shuffle-free bucket join, found ${shuffles.size} exchanges")

    // bucket-aware aggregation: groupBy on the bucket key also avoids
    // a shuffle (data already hash-distributed by k)
    val agg = spark.table("b_facts").groupBy("k").count()
    val aggShuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(aggShuffles.isEmpty)
    assert(agg.count() == 100)
  }
}
