package graft.plugins

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.core.Loader
import graft.plugins.transform._

/** classify_nb plugin: config surface over
  * [[graft.ops.NaiveBayes.trainPredict]] — semi-supervised default
  * (labeled rows train, everything scores), filter options, dry-run
  * schema and loader registration. */
class ClassifyNbPluginSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._
  private val dir = Paths.get("/tmp")

  private def docs = Seq(
    (0L, "spam spam offer", "bad"),
    (1L, "meeting notes agenda", "good"),
    (2L, "spam offer deal", "bad"),
    (3L, "agenda followup notes", "good"),
    (4L, "spam offer spam offer", null),
    (5L, "notes from the meeting", null)
  ).toDF("doc_id", "text", "label")

  test("default: labeled rows train, all rows predict") {
    val plug = new ClassifyNbPlugin(
      Map("id_column" -> "doc_id", "label_column" -> "label"),
      dir, "default")
    val out = plug.execute(docs).fold(e => fail(e.getMessage), identity)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 6) // unlabeled rows scored too
    assert(out(4L) == "bad" && out(5L) == "good")
    assert(out(0L) == "bad" && out(3L) == "good")
  }

  test("predict_filter restricts the scored slice") {
    val plug = new ClassifyNbPlugin(
      Map("id_column" -> "doc_id", "label_column" -> "label",
        "predict_filter" -> "label IS NULL"),
      dir, "default")
    val out = plug.execute(docs).fold(e => fail(e.getMessage), identity)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(4L, 5L))
  }

  test("dry-run: output schema and missing-column errors") {
    val plug = new ClassifyNbPlugin(
      Map("id_column" -> "doc_id", "label_column" -> "label"),
      dir, "default")
    val dry = plug.dryRun(docs.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == Seq("doc_id", "pred", "score"))
    assert(dry("pred").dataType == StringType)
    assert(dry("score").dataType == DoubleType)
    assert(plug.dryRun(StructType(Seq(StructField("doc_id", LongType))))
      .left.toOption.get.getMessage.contains("not found"))
    assert(new ClassifyNbPlugin(Map("id_column" -> "doc_id"), dir, "x")
      .execute(docs).left.toOption.get.getMessage
      .contains("'label_column' is required"))
  }

  test("loader resolves the classify_nb module name") {
    val plug = Loader.instantiate("classify_nb",
      Map("id_column" -> "doc_id", "label_column" -> "label"),
      dir, "default")
    assert(plug.fold(e => fail(e.getMessage), _.name) == "classify_nb")
  }
}
