package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Null/empty/degenerate inputs must flow through, not crash: at
  * 100 TB there is ALWAYS a null text and an empty partition. */
class RobustnessSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private val withNulls = Seq(
    (0L, "normal document text here"),
    (1L, null.asInstanceOf[String]),
    (2L, ""),
    (3L, "   "),
    (4L, "x")
  ).toDF("doc_id", "text")

  test("text analysis over null/empty/blank/1-char text") {
    val out = Text.analyze(withNulls, "text").collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(2L).getAs[Int]("n_tokens") == 0)
    assert(byId(3L).getAs[Int]("n_tokens") == 0)
    assert(byId(4L).getAs[Int]("n_tokens") == 1)
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("n_tokens"))) // null in, null out
  }

  test("dedup families ignore null text rows without crashing") {
    assert(Dedup.byFingerprint(withNulls, "doc_id", "text").count() >= 3)
    val mh = Dedup.minhashCandidatePairs(withNulls, "doc_id", "text")
    assert(mh.count() >= 0) // no crash; null doc contributes no pairs
    assert(!mh.collect().exists(r => r.getLong(0) == 1L || r.getLong(1) == 1L))
    assert(Dedup.simhashPairs(withNulls, "doc_id", "text").count() >= 0)
    assert(Dedup.ngramJaccardPairs(withNulls, "doc_id", "text", 3, 0.1).count() >= 0)
  }

  test("empty input tables flow through pipelines and ops") {
    val empty = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(Dedup.exact(empty, "doc_id", Seq("text")).count() == 0)
    assert(Dedup.minhashCandidatePairs(empty, "doc_id", "text").count() == 0)
    assert(Text.analyze(empty, "text").count() == 0)

    val emptyVec = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.bruteForceTopK(emptyVec, emptyVec,
      "vec_id", "embedding", 5).count() == 0)
  }

  test("as-of and range joins with empty right side") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "id")
    val rEmpty = Seq.empty[(Long, Long, String)].toDF("k", "t2", "rid")
    assert(AsOfJoin.asOf(l, rEmpty, Seq("k"), "t", "t2").count() == 0)
    assert(AsOfJoin.asOf(l, rEmpty, Seq("k"), "t", "t2",
      joinType = "left").count() == 1)
    assert(RangeJoin.within(l, rEmpty, Seq("k"), "t", "t2", 10L).count() == 0)
  }
}
