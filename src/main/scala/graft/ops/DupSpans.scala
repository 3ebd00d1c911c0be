package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Cross-document duplicated-span detection: the corpus-level
  * "repeated substring" signal of Lee et al., *Deduplicating Training
  * Data Makes Language Models Better* (ACL 2022) — there built with a
  * suffix array on one machine; here re-expressed as the
  * shuffle-friendly k-token rolling-window form.
  *
  * A span-gram is the k-token window starting at token position `p`
  * (1-based) of a document's normalized text. A span-gram is
  * DUPLICATED when the identical k tokens occur at ≥ `minOccurrences`
  * positions anywhere in the corpus (within-document repeats count —
  * a doc that repeats its own boilerplate is just as contaminated).
  * Per document we report how much of it is made of duplicated
  * spans: the gram-level ratio and the token-coverage ratio (fraction
  * of token positions lying under at least one duplicated window) —
  * the number used to gate or trim documents in RefinedWeb-style
  * curation.
  *
  * Scale shape (the suffix-array construction cannot shard; this
  * can):
  *  1. ONE projection tokenizes and windows each doc — narrow
  *     `(id, n_tokens, pos, h)` rows where `h` is `md5` of the joined
  *     window (md5, not xxhash64, so DuckDB reproduces it; the
  *     32-hex-char payload is what rides the shuffle, never the
  *     window text). `n_tokens` rides along and docs too short to
  *     window emit one null-gram row (`posexplode_outer`), so the
  *     per-doc token count needs NO second scan of the corpus text.
  *     The frame is persisted (deserialized, disk-spillable) because
  *     two consumers read it — the corpus-wide count and the
  *     flag-back join — and re-tokenizing 100 TB of text twice costs
  *     more than caching the ~48 B/token narrow rows once;
  *  3. occurrences join back to the ≥min counts on `h` — both sides
  *     hash-partitioned on `h`, AQE free to broadcast the dup set
  *     when it is small;
  *  4. coverage is a bounded ×k explode of the *duplicated* positions
  *     only, then a per-doc distinct count — never quadratic, and
  *     proportional to the duplication actually present.
  * No step holds a document's full token array across a shuffle
  * boundary and no step compares documents pairwise, so the plan
  * survives a corpus where a million docs share one boilerplate
  * family (that family is one `h` group — a count, not a clique).
  */
object DupSpans {

  /** Narrow span-gram occurrence rows `(idCol, pos, h)`, pos 1-based.
    * Docs with fewer than `k` tokens (or no tokens) emit none. */
  def spanGramOccurrences(df: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame =
    occurrencesWithTokens(df, idCol, textCol, k)
      .filter(col("h").isNotNull)
      .select(col(idCol), col("pos"), col("h"))

  /** The single tokenize+window pass: `(idCol, n_tokens, pos, h)`.
    * One row per span-gram occurrence, plus one `(pos, h) = NULL` row
    * for each doc too short to window (`posexplode_outer`), so the
    * per-doc token count is carried by the same projection instead of
    * a second scan of the corpus text. */
  private def occurrencesWithTokens(df: DataFrame, idCol: String,
                                    textCol: String, k: Int): DataFrame = {
    require(k >= 2, s"span width k must be >= 2, got $k")
    val toks = when(length(col("_t")) === 0, array())
      .otherwise(split(col("_t"), " "))
    df.select(col(idCol), Text.normalize(col(textCol)).as("_t"))
      .select(col(idCol), toks.as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"),
        posexplode_outer(
          when(size(col("_toks")) < k, array().cast("array<string>"))
            .otherwise(
              transform(sequence(lit(1), size(col("_toks")) - (k - 1)),
                i => md5(array_join(slice(col("_toks"), i, lit(k)), " ")
                  .cast("binary"))))))
      .select(col(idCol), col("n_tokens"),
        (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))
  }

  /** Per-document duplicated-span statistics:
    * `(idCol, n_tokens, n_grams, n_dup_grams, covered_tokens,
    * dup_gram_ratio, coverage_ratio)` — one row per input document
    * (zero stats for docs too short to window). Ratios are plain
    * doubles of small-integer divisions, so they reproduce exactly
    * cross-engine. */
  def spanStats(df: DataFrame, idCol: String, textCol: String,
                k: Int, minOccurrences: Int = 2): DataFrame = {
    require(minOccurrences >= 2,
      s"minOccurrences must be >= 2, got $minOccurrences")
    // Persist the narrow rows: the dup-count branch and the flag-back
    // join both read them, and one cached pass beats tokenizing the
    // corpus text twice. Blocks are reclaimed by the ContextCleaner
    // once the returned frame is dropped.
    val occ = occurrencesWithTokens(df, idCol, textCol, k)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Corpus-wide occurrence counts; only the ≥min hashes survive.
    val dup = occ.filter(col("h").isNotNull)
      .groupBy("h").agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minOccurrences)
      .select("h")
    // Null h (short docs) never matches — their row survives unflagged.
    val flagged = occ.join(dup.withColumn("_isdup", lit(true)),
      Seq("h"), "left")
    val gramStats = flagged.groupBy(idCol).agg(
      first(col("n_tokens")).as("n_tokens"),
      count(col("h")).as("n_grams"), // count(h) skips the null-gram rows
      sum(when(col("_isdup"), 1L).otherwise(0L)).as("n_dup_grams"))
    // Token coverage: explode duplicated windows to token positions
    // (bounded ×k on the dup subset only), distinct per doc.
    val covered = flagged.filter(col("_isdup"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("_tok"))
      .groupBy(idCol).agg(countDistinct(col("_tok")).as("covered_tokens"))
    gramStats
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_gram_ratio",
        when(col("n_grams") === 0, lit(0.0)).otherwise(
          col("n_dup_grams").cast("double") / col("n_grams")))
      .withColumn("coverage_ratio",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          col("covered_tokens").cast("double") / col("n_tokens")))
  }

  /** Gate: keep documents whose duplicated-span token coverage stays
    * UNDER `maxCoverage` (strictly-less; a doc sitting exactly on the
    * bound is dropped — the conservative direction for a
    * contamination gate). */
  def filterByCoverage(df: DataFrame, idCol: String, textCol: String,
                       k: Int, maxCoverage: Double,
                       minOccurrences: Int = 2): DataFrame = {
    val stats = spanStats(df, idCol, textCol, k, minOccurrences)
      .select(col(idCol), col("coverage_ratio"))
    df.join(stats, Seq(idCol), "left")
      .filter(coalesce(col("coverage_ratio"), lit(0.0)) < maxCoverage)
      .drop("coverage_ratio")
  }

  /** SURGICAL duplicated-span removal (the ExactSubstr-remove mode of
    * Lee et al. 2022, re-expressed shuffle-friendly): delete every
    * token lying under a corpus-duplicated k-token window and rebuild
    * the text from the survivors, instead of gating whole documents.
    * Appends `clean_text` (normalized-token rebuild, space-joined —
    * detection runs on [[Text.normalize]]d tokens, so the rebuild is
    * in that space too) and `n_tokens_removed`. NULL text passes
    * through NULL; a doc made entirely of duplicated spans keeps an
    * empty string. ALL occurrences of a duplicated span are removed —
    * the conservative policy for contamination-grade spans (dropping
    * the copies but keeping one original is [[filterByCoverage]]'s
    * territory via doc-level triage).
    *
    * Scale shape: the window/count/flag stages are exactly
    * [[spanStats]]'s narrow rows (nothing pairwise, flood families
    * collapse to one hash group); removal adds one per-token
    * projection of the corpus, a (id, pos) anti-join against the
    * duplicated-coverage positions (skinny longs; AQE sizes it), and
    * one per-doc reassembly aggregation — the same shape as
    * [[Dedup.removeBoilerplateLines]]. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            k: Int, minOccurrences: Int = 2): DataFrame = {
    require(minOccurrences >= 2,
      s"minOccurrences must be >= 2, got $minOccurrences")
    val occ = spanGramOccurrences(df, idCol, textCol, k)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dup = occ.groupBy("h").agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minOccurrences)
      .select("h")
    // distinct duplicated token positions per doc (bounded ×k explode
    // of the duplicated windows only)
    val covered = occ.join(dup, Seq("h"))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("_p"))
      .distinct()
    // per-token rows of the same normalized space the windows hashed
    val toks = df
      .select(col(idCol), Text.normalize(col(textCol)).as("_t"))
      .select(col(idCol),
        posexplode(when(length(col("_t")) === 0, array().cast("array<string>"))
          .otherwise(split(col("_t"), " "))).as(Seq("_p0", "_tok")))
      .select(col(idCol), (col("_p0") + 1).cast("long").as("_p"), col("_tok"))
    val kept = toks.join(covered, Seq(idCol, "_p"), "left_anti")
      .groupBy(idCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_p"), col("_tok")))),
        s => s.getField("_tok")), " ").as("_kept"))
    val removed = covered.groupBy(idCol)
      .agg(count(lit(1)).as("_n_removed"))
    df.join(kept, Seq(idCol), "left")
      .join(removed, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(coalesce(col("_kept"), lit(""))))
      .withColumn("n_tokens_removed",
        when(col(textCol).isNull, lit(null).cast("long"))
          .otherwise(coalesce(col("_n_removed"), lit(0L))))
      .drop("_kept", "_n_removed")
  }
}
