package graft.plugins

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.transform._

/** resample plugin: config surface over Resample.forwardFill. */
class ResamplePluginSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._
  private val dir = Paths.get("/tmp")

  private def events = Seq(
    ("u", 10L * 1000000000L, 1.0),
    ("u", 130L * 1000000000L, 2.0)
  ).toDF("k", "ts", "value")

  test("execute fills gaps; dry-run schema; option errors") {
    val plug = new ResamplePlugin(Map("key_column" -> "k",
      "ts_column" -> "ts", "value_column" -> "value",
      "step_seconds" -> 60), dir, "default")
    val out = plug.execute(events).fold(e => fail(e.getMessage), identity)
      .orderBy("slot_start")
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out == Seq(("u", 0L, 1.0, 1L), ("u", 60L, 1.0, 0L),
      ("u", 120L, 2.0, 1L)))
    val dry = plug.dryRun(events.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == Seq("k", "slot_start", "value", "n_obs"))
    assert(dry("value").dataType == DoubleType)
    assert(plug.dryRun(StructType(Seq(StructField("k", StringType))))
      .left.toOption.get.getMessage.contains("not found"))
    assert(new ResamplePlugin(Map("key_column" -> "k"), dir, "x")
      .execute(events).left.toOption.get.getMessage
      .contains("'ts_column' is required"))
  }
}
