package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.expressions.BloomMightContain

class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("probe has ZERO false negatives against stat.bloomFilter (string keys)") {
    // the whole design rests on this: a false negative would silently
    // keep a duplicate. Probe every inserted key.
    val keys = (1 to 2000).map(i => s"key_$i%07d")
    val ref = keys.toDF("k")
    val bytes = IncrementalDedup.buildFilter(ref, "k", expectedItems = 2000).get
    val bcast = spark.sparkContext.broadcast(bytes)
    val misses = ref
      .filter(!BloomMightContain.might_contain($"k", bcast))
      .count()
    assert(misses == 0L)
  }

  test("probe has ZERO false negatives for long keys") {
    val ref = (1L to 2000L).map(_ * 2654435761L).toDF("k")
    val bytes = IncrementalDedup.buildFilter(ref, "k", expectedItems = 2000).get
    val bcast = spark.sparkContext.broadcast(bytes)
    val misses = ref
      .filter(!BloomMightContain.might_contain($"k", bcast)).count()
    assert(misses == 0L)
  }

  test("fpp is honored within reason on non-members") {
    val ref = (1 to 5000).map(i => s"in_$i").toDF("k")
    val bytes = IncrementalDedup.buildFilter(ref, "k",
      expectedItems = 5000, fpp = 0.01).get
    val bcast = spark.sparkContext.broadcast(bytes)
    val fp = (1 to 5000).map(i => s"out_$i").toDF("k")
      .filter(BloomMightContain.might_contain($"k", bcast)).count()
    assert(fp < 5000 * 0.05, s"$fp false positives out of 5000 at fpp=0.01")
  }

  test("cleaned == exact anti-join, including NULL keys and dup keys") {
    val rnd = new scala.util.Random(3)
    val ref = Seq.fill(800)(s"doc_${rnd.nextInt(500)}").toDF("k")
    val batchKeys = Seq.fill(400)(Option(s"doc_${rnd.nextInt(1000)}")) ++
      Seq(None, None)
    val batch = batchKeys.zipWithIndex.toDF("k", "row_id")
    val got = IncrementalDedup.cleaned(batch, ref, "k")
      .select("row_id").as[Int].collect().sorted.toSeq
    val want = batch.join(ref.select("k").distinct(), Seq("k"), "left_anti")
      .select("row_id").as[Int].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.size < batchKeys.size)
  }
}
