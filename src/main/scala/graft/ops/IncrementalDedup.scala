package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Incremental (cross-corpus) dedup: drop rows of a NEW batch whose
  * key already exists in a REFERENCE corpus — the steady-state shape
  * of a training-data pipeline, where yesterday's 100 TB corpus is
  * fixed and today's crawl must be deduped against it.
  *
  * The naive plan anti-joins the full batch against the full
  * reference: both sides shuffle on the key, and the (huge) reference
  * pays that shuffle on EVERY batch. Here the reference is summarized
  * once into a Bloom filter (one scan, partial aggregation, a few
  * bits/key) that broadcasts to executors; the batch then splits
  * shuffle-free:
  *
  *   - bloom-negative rows are DEFINITELY new (no false negatives) —
  *     kept with zero join work; at typical dup rates that is most of
  *     the batch;
  *   - bloom-positive candidates (true dups + `fpp` false positives)
  *     are exact-verified with an anti-join whose left side is now
  *     only the candidate sliver.
  *
  * Result is EXACTLY the anti-join (the filter only routes rows
  * between the fast path and the verify path), so the operator stays
  * under the hash oracle. The verify join still shuffles reference
  * KEYS once; storing the reference bucketed by key (writer
  * `bucket_by`) removes that too. The filter itself is built with the
  * public `DataFrameStatFunctions.bloomFilter` one-pass aggregate and
  * is reusable across batches — build once, persist, probe many.
  */
object IncrementalDedup {

  /** Serialized one-pass Bloom summary of `reference[keyCol]`, or
    * None for an empty/all-NULL reference (Spark's `bloomFilter`
    * aggregate yields a null buffer there — SPARK NPEs on readFrom).
    * `expectedItems` sizes the bit array; pass the known corpus
    * cardinality to avoid the sizing `count()` pass. */
  def buildFilter(reference: DataFrame, keyCol: String,
                  expectedItems: Long = 0L,
                  fpp: Double = 0.01): Option[Array[Byte]] = {
    val items =
      if (expectedItems > 0) expectedItems
      else reference.select(keyCol).count()
    if (items == 0) return None
    try {
      val bloom = reference.stat.bloomFilter(keyCol, items, fpp)
      val out = new ByteArrayOutputStream()
      bloom.writeTo(out)
      Some(out.toByteArray)
    } catch {
      // expectedItems > 0 but the frame was actually empty/all-NULL
      case _: NullPointerException => None
    }
  }

  /** Rows of `batch` whose `keyCol` is NOT in `reference` (exact;
    * NULL keys are always kept, as in a left-anti join).
    *
    * REQUIRES a deterministic `batch` plan: the bloom-negative and
    * bloom-positive branches are complementary filters over the same
    * upstream, each executed independently (and [[buildFilter]] may
    * additionally run an eager sizing count at construction time) —
    * a nondeterministic upstream (`rand`, `sample`, fresh
    * `monotonically_increasing_id`) can drop or duplicate rows
    * relative to the single-pass anti-join this equals. Persist or
    * checkpoint such a batch first (same caveat family as
    * [[Sampling.mixToWeights]]). */
  def cleaned(batch: DataFrame, reference: DataFrame, keyCol: String,
              expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(reference, keyCol, expectedItems, fpp) match {
      case None => return batch // nothing to dedup against
      case Some(b) => b
    }
    val bcast = batch.sparkSession.sparkContext.broadcast(bytes)
    val might = BloomMightContain.might_contain(col(keyCol), bcast)
    val definitelyNew = batch.filter(!might)
    val candidates = batch.filter(might)
    val refKeys = reference.select(col(keyCol)).distinct()
    val verifiedNew = candidates.join(refKeys, Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }
}
