package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** BPE training (driver-side, bounded sample) and the distributed
  * encode kernel. The encode WALK itself is oracled cell-for-cell by
  * q_bpe_encode; this suite pins training semantics — merge order on
  * the classic corpus from the BPE paper (Sennrich et al. 2016 §3.2's
  * low/lower/newest/widest example, adapted to this scheme's
  * no-end-marker symbols) — and train→encode composition. */
class BpeSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark
  import spark.implicits._

  private def corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")

  test("training learns the paper corpus's merge order (hand-computed)") {
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    // round-by-round: pair counts with (count desc, pair asc) ties —
    // (e,s)=9 ties (s,t)=9 lexicographically, then (es,t)=9,
    // (l,o)=7 ties (o,w)=7, (lo,w)=7, (e,w)=6 ties (n,e)/(w,est)
    assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o",
      "lo" -> "w", "e" -> "w"))
  }

  test("training is deterministic and respects minPairCount") {
    val a = Bpe.train(corpus, "text", numMerges = 50)
    val b = Bpe.train(corpus, "text", numMerges = 50)
    assert(a == b)
    // every learned pair occurred at least twice in the sample
    val none = Bpe.train(corpus, "text", numMerges = 50,
      minPairCount = 1000L)
    assert(none.isEmpty)
  }

  test("train -> encode collapses frequent words to single tokens") {
    val merges = Bpe.train(corpus, "text", numMerges = 50)
    val enc = Bpe.encode(Seq((1L, "low newest lowest")).toDF("id", "text"),
      "text", merges)
      .select("tokens").as[Seq[String]].head
    // trained words collapse fully; the unseen "lowest" reuses learned
    // subwords (low + est)
    assert(enc.take(2) == Seq("low", "newest"))
    assert(enc.drop(2) == Seq("low", "est"))
  }

  test("encode round-trip: token concatenation reconstructs the normalized text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val merges = Bpe.train(docs, "text", numMerges = 100)
    assert(merges.nonEmpty)
    val checked = Bpe.encode(docs, "text", merges)
      .withColumn("_norm", Text.normalize(col("text")))
      .withColumn("_rebuilt", concat_ws("", col("tokens")))
      .withColumn("_ok",
        replace(col("_norm"), lit(" "), lit("")) === col("_rebuilt"))
    assert(checked.filter(!col("_ok")).count() == 0)
    // compression: merged tokens never outnumber codepoints
    val bad = checked.filter(size(col("tokens")) >
      length(replace(col("_norm"), lit(" "), lit(""))))
    assert(bad.count() == 0)
  }
}
