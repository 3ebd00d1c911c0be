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
    // SHUFFLE_HASH pin (round-13 audit): the reference is the
    // ACCUMULATED store — corpus-scale by contract — and the distinct
    // here can plan with NO exchange below (partial+final fuse), so a
    // lying estimate would statically broadcast corpus-scale keys
    // with nothing for AQE to measure first. Skinny key rows → hash
    // build is fine; the Bloom prefilter above already bounded the
    // probe side.
    val refKeys = reference.select(col(keyCol)).distinct()
    val verifiedNew = candidates.join(refKeys.hint("SHUFFLE_HASH"),
      Seq(keyCol), "left_anti")
    definitelyNew.unionByName(verifiedNew)
  }

  /** NEAR-dup incremental dedup: drop batch rows whose text is a
    * verified near-duplicate (character-shingle Jaccard >=
    * `threshold`) of ANY reference document — the fuzzy counterpart
    * of [[cleaned]] for the steady-state crawl: yesterday's corpus is
    * fixed; today's batch must not re-admit paraphrases/boilerplate
    * variants of it.
    *
    * Construction mirrors [[Dedup.ngramJaccardVerified]] split
    * across two tables: minhash-band buckets on BOTH sides, a
    * cross-side equi-join on (band, bucket-hash) proposes candidate
    * (batch, reference) pairs — never all-pairs — and each candidate
    * is exact-verified once on sorted shingle hashes. Matched batch
    * ids anti-join out. Same exactness preconditions as the
    * self-join variant (S-curve bound at the threshold, no over-cap
    * bucket): under them the kept set equals the quadratic verifier.
    *
    * Scale shape: the reference's banded signatures are
    * O(bands · refRows) narrow rows — at a fixed reference they are
    * the natural thing to precompute and store; this method accepts
    * the raw frame and derives them (one pass). The bucket join
    * shuffles signatures, not text; only candidate pairs ever
    * compare shingle sets. */
  def nearDupCleaned(batch: DataFrame, reference: DataFrame,
                     idCol: String, textCol: String,
                     shingleK: Int = 5, threshold: Double = 0.8,
                     numHashes: Int = 64, bands: Int = 16,
                     maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    def banded(df: DataFrame, side: String) =
      Dedup.minhashSignatures(df, idCol, textCol, shingleK, numHashes)
        .select(col(idCol).as(side),
          explode(transform(sequence(lit(0), lit(bands - 1)), b =>
            struct(b.as("band"),
              xxhash64(array_join(transform(
                slice(col("sig"), b * r + 1, lit(r)), _.cast("string")),
                ",")).as("bh")))).as("bucket"))
        .select(col(side), col("bucket.band").as("band"),
          col("bucket.bh").as("bh"))
    val bb = banded(batch, "_bid")
    val rb = banded(reference, "_rid")
    // flood guard on the reference side (the fixed corpus is where
    // boilerplate floods live); over-cap buckets drop, costing
    // recall never soundness
    val keep = rb.groupBy("band", "bh").agg(count(lit(1)).as("_n"))
      .filter(col("_n") <= maxBucket).select("band", "bh")
    // SHUFFLE_HASH pins (round-13 audit, same rule as the self-join
    // family in Dedup): batch AND reference are both unbounded by
    // contract, their banded subtrees are pure per-row expression
    // chains (no exchange below → AQE-blind), and the audit caught
    // the static planner broadcasting them off a lying estimate.
    // Banded rows are skinny (id, band, bh) → hash builds.
    // Build sides: `keep` (bucket-space-bounded counts) under the
    // inner filter join; the capped reference-banded rows (flood cap
    // bounds every bucket) under the candidate join.
    val refSide = rb.join(keep.hint("SHUFFLE_HASH"), Seq("band", "bh"))
    val candidates = bb
      .join(refSide.hint("SHUFFLE_HASH"), Seq("band", "bh"))
      .select("_bid", "_rid").distinct()

    def shingles(df: DataFrame, out: String) = df
      .select(col(idCol).as(out), Text.normalize(col(textCol)).as("_t"))
      .select(col(out), Dedup.shinglesOfNormalized(col("_t"), shingleK).as("_sh"))
      .select(col(out),
        array_sort(transform(col("_sh"), s => xxhash64(s))).as(out + "_sh"))
    // MERGE pins on the two shingle-ARRAY attaches (the exact
    // ngramJaccardVerified rule): both sides are unbounded, the
    // subtrees are expression-only (AQE-blind), and an unspillable
    // hash build of shingle arrays is the shape that OOMed the ×100
    // self-join run. Sort-merge spills; candidates stay the stream.
    val matched = candidates
      .join(shingles(batch, "_bid").hint("MERGE"), Seq("_bid"))
      .join(shingles(reference, "_rid").hint("MERGE"), Seq("_rid"))
      .select(col("_bid"),
        graft.expressions.SortedLongJaccard.sorted_long_jaccard(
          col("_bid_sh"), col("_rid_sh")).as("_j"))
      .filter(col("_j") >= threshold)
      .select(col("_bid").as(idCol)).distinct()
    batch.join(matched, Seq(idCol), "left_anti")
  }
}
