package graft.plugins

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.plugins.transform._

/** expect plugin: report shape, gate pass-through and gate failure. */
class ExpectPluginSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._
  private val dir = Paths.get("/tmp")

  private def rows = Seq((1L, 10.0), (2L, -3.0), (2L, 5.0))
    .toDF("id", "amount")

  test("report mode counts violations per rule") {
    val plug = new ExpectPlugin(Map(
      "rules" -> Map("amount_pos" -> "amount > 0", "id_pos" -> "id > 0"),
      "unique" -> Map("id_unique" -> Seq("id"))), dir, "default")
    val out = plug.execute(rows).fold(e => fail(e.getMessage), identity)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out("amount_pos") == ((1L, false)))
    assert(out("id_pos") == ((0L, true)))
    assert(out("id_unique") == ((1L, false))) // one extra row for id=2
    val dry = plug.dryRun(rows.schema).fold(e => fail(e.getMessage), identity)
    assert(dry.fieldNames.toSeq == Seq("rule", "n_violations", "pass"))
  }

  test("gate mode passes clean data through, stops on violations") {
    val clean = new ExpectPlugin(Map("mode" -> "gate",
      "rules" -> Map("id_pos" -> "id > 0")), dir, "default")
    val through = clean.execute(rows).fold(e => fail(e.getMessage), identity)
    assert(through.collect().length == 3) // untouched stream
    assert(clean.dryRun(rows.schema)
      .fold(e => fail(e.getMessage), identity) == rows.schema)

    val gate = new ExpectPlugin(Map("mode" -> "gate",
      "rules" -> Map("amount_pos" -> "amount > 0")), dir, "default")
    val err = gate.execute(rows).left.toOption.get
    assert(err.getMessage.contains("amount_pos (1 violations)"))
  }

  test("null predicate result counts as a violation; option errors") {
    val withNull = Seq((1L, Some(2.0)), (2L, None))
      .toDF("id", "amount")
    val plug = new ExpectPlugin(Map(
      "rules" -> Map("amount_pos" -> "amount > 0")), dir, "default")
    val out = plug.execute(withNull).fold(e => fail(e.getMessage), identity)
      .collect()
    assert(out(0).getLong(1) == 1L) // null comparison -> violation
    assert(new ExpectPlugin(Map.empty[String, Any], dir, "x")
      .execute(rows).left.toOption.get.getMessage
      .contains("at least one expectation rule"))
    assert(new ExpectPlugin(Map("mode" -> "bogus",
      "rules" -> Map("r" -> "id > 0")), dir, "x")
      .execute(rows).left.toOption.get.getMessage
      .contains("Unknown expect mode"))
  }
}
