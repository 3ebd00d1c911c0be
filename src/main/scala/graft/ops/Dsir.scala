package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick the `k` raw-corpus documents that look
  * most like a small curated TARGET corpus, the standard "make the
  * web crawl resemble Wikipedia+books" pretraining curation step.
  *
  * Model: hashed n-gram (unigram + bigram) bag-of-features. Both
  * corpora fit an add-α smoothed multinomial over `buckets` hashed
  * feature buckets,
  *
  *   p_b = (C_target(b) + α) / (T + α·B)
  *   q_b = (C_raw(b)    + α) / (R + α·B)
  *
  * and a document's log importance weight is
  * `log w(x) = Σ_b c_b(x) · (ln p_b − ln q_b)` — large when the doc's
  * feature mass sits in buckets the target over-represents relative
  * to the raw pool. Sampling without replacement ∝ w(x) is done as
  * Gumbel top-k: `key = log w + G_id` with `G_id = −ln(−ln(u_id))`
  * and `u_id` a seeded md5 hash of the document id — deterministic,
  * reproducible, engine-portable (no RNG; the DuckDB oracle replays
  * the identical hash).
  *
  * Scale shape: the per-doc feature explode is narrow `(id, bucket,
  * cnt)` rows with map-side partial aggregation; BOTH fitted models
  * collapse to ≤ `buckets` rows (orders of magnitude below corpus
  * size — broadcast when small), the totals are 1-row aggregates
  * (never driver constants), and the final top-k plans as
  * TakeOrderedAndProject — no global sort, no collect, nothing on
  * the driver. Doubling the corpus doubles only the feature-explode
  * mass; the model stays `buckets`-bounded. The target corpus is fit
  * by bucket alone (no per-doc stage), so it needs only a text
  * column — no id.
  *
  * Determinism contract: documents whose normalized text is empty
  * emit no features, get no score, and are never selected (no
  * evidence, no pick — same convention as [[LmScore.filterByScore]]).
  * A target corpus with no scoreable text fits no model, so NO raw
  * document is scoreable and the result is EMPTY — never a silent
  * arbitrary pick. Selection order is by the ROUNDED (`roundTo`
  * decimals) Gumbel key descending with id ascending as tiebreak, so
  * last-ulp `ln` noise between engines cannot flip the selected set.
  */
object Dsir {

  private val U32 = 4294967296.0 // 2^32, the md5-prefix hash range

  /** One hashed-gram bucket row per unigram/bigram occurrence, with
    * `keep` columns carried through. One normalize + ONE explode for
    * both gram orders (a union of separate unigram/bigram subtrees
    * would normalize and scan the corpus twice — measured 1.5× the
    * whole op at sf0.1). Bigrams zip the token array with its own
    * tail; single-token docs contribute unigrams only (empty zip). */
  private def gramBuckets(df: DataFrame, textCol: String, buckets: Int,
                          keep: Seq[Column]): DataFrame = {
    val toks = col("_toks")
    val grams = concat(toks,
      zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    df.select(keep :+ Text.normalize(col(textCol)).as("_t"): _*)
      .filter(length(col("_t")) > 0)
      .select(keep :+ split(col("_t"), " ").as("_toks"): _*)
      .select(keep :+ explode(grams).as("_g"): _*)
      .select(keep :+
        pmod(Sampling.keyHash(col("_g")), lit(buckets.toLong)).as("bucket"): _*)
  }

  /** Hashed unigram+bigram feature counts: `(idCol, bucket, cnt)`.
    * A unigram can never collide with a bigram pre-hash: normalized
    * tokens contain no spaces, bigrams are space-joined. Bucket =
    * md5-prefix hash of the gram mod `buckets` — the engine-portable
    * hash used across graft. */
  def featureRows(df: DataFrame, idCol: String, textCol: String,
                  buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    gramBuckets(df, textCol, buckets, Seq(col(idCol)))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-document log importance weight `(idCol, dsir_logw)` of every
    * scoreable `raw` document against the `target` corpus (which
    * only needs `textCol`; see class doc for the empty-target
    * contract). */
  def scoreDocs(raw: DataFrame, target: DataFrame, idCol: String,
                textCol: String, buckets: Int = 8192,
                alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val rawFeat = featureRows(raw, idCol, textCol, buckets)
    val tFit = gramBuckets(target, textCol, buckets, Nil)
      .groupBy(col("bucket")).agg(count(lit(1)).as("_tc"))
    val rFit = rawFeat.groupBy(col("bucket")).agg(sum(col("cnt")).as("_rc"))
    val tTot = tFit.agg(sum(col("_tc")).as("_T")) // 1 row
    val rTot = rFit.agg(sum(col("_rc")).as("_R")) // 1 row
    // Only buckets that occur in raw docs can contribute to a raw
    // doc's score, so the model grid is rFit's buckets; target-only
    // buckets are irrelevant by construction (c_b(x) = 0).
    val model0 = rFit
      .join(tFit, Seq("bucket"), "left")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("bucket"),
        (log(coalesce(col("_tc"), lit(0L)) + alpha)
          - log(col("_T") + alpha * buckets)
          - log(col("_rc") + alpha)
          + log(col("_R") + alpha * buckets)).as("_lr"))
    // The model is buckets-bounded; broadcast it under the scoring
    // join unless the user asked for a pathologically wide hash
    // space (then AQE decides).
    val model = if (buckets <= (1 << 22)) broadcast(model0) else model0
    rawFeat.join(model, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("_lr")).as("dsir_logw"))
      // NULL logw happens exactly when the target fit is empty
      // (_T aggregates zero rows to NULL): nothing is scoreable,
      // return nothing — not an arbitrary NULL-scored pick
      .filter(col("dsir_logw").isNotNull)
  }

  /** MIXTURE target model: per-document log importance weight
    * against a WEIGHTED BLEND of K target corpora — the practical
    * "make the crawl resemble w₁·Wiki + w₂·books + w₃·code" form.
    * The target distribution is the convex mixture of the K add-α
    * smoothed per-target multinomials,
    *
    *   p_mix,b = Σ_t (w_t / Σw) · (C_t(b) + α) / (T_t + α·B)
    *
    * and `log w(x) = Σ_b c_b(x) · (ln p_mix,b − ln q_b)` exactly as
    * in [[scoreDocs]]. Scale shape is unchanged: each target fits to
    * ≤ `buckets` rows, the K fits left-join onto the raw-grid bucket
    * frame (K buckets-bounded joins — NOT K corpus scans of raw),
    * and the blended model broadcasts under the one scoring join.
    *
    * Degenerate contract (NULL-propagated, same spirit as the
    * single-target rule): a target whose normalized text is empty
    * fits no model (its total window stays NULL), which NULLs
    * p_mix for every bucket and empties the result — drop or
    * re-weight empty targets explicitly upstream rather than have
    * the engine silently renormalize the mixture. */
  def scoreDocsMix(raw: DataFrame, targets: Seq[(DataFrame, Double)],
                   idCol: String, textCol: String, buckets: Int = 8192,
                   alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    require(targets.nonEmpty, "at least one target corpus is required")
    targets.zipWithIndex.foreach { case ((_, w), i) =>
      require(w > 0, s"target weight $i must be > 0, got $w") }
    val wSum = targets.map(_._2).sum
    val rawFeat = featureRows(raw, idCol, textCol, buckets)
    val rFit = rawFeat.groupBy(col("bucket")).agg(sum(col("cnt")).as("_rc"))
    // Fold the K target fits onto the raw-grid bucket frame; each
    // join is buckets-bounded (the fits are aggregates, never docs).
    // One aggregation per target serves both the per-bucket fit and
    // the corpus total: the total rides the fit as a global-window
    // sum over the ≤`buckets` aggregate rows — a single-partition
    // exchange of model-sized rows, never a second scan/normalize of
    // the target corpus. (The obvious alternatives both re-scan: a
    // separate fit.agg(total) only dedups when runtime exchange
    // reuse kicks in, and a rollup splits into two stages because
    // the grouping-id filters push below the shuffle.)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val grid0 = targets.zipWithIndex.foldLeft(rFit) {
      case (acc, ((t, _), i)) =>
        val tFit = gramBuckets(t, textCol, buckets, Nil)
          .groupBy(col("bucket")).agg(count(lit(1)).as(s"_tc$i"))
          .withColumn(s"_tt$i", sum(col(s"_tc$i")).over(wAll))
        acc.join(tFit, Seq("bucket"), "left")
    }
    // Buckets the fit never saw joined NULL totals: spread each
    // target's total (and the raw total, replacing the old 1-row
    // cross-join attaches) to every grid row — the K+1 windows share
    // one single-partition pass over the ≤`buckets` grid rows. An
    // EMPTY target has no fit rows at all, so its max() stays NULL
    // on every row and pMix NULLs the result — the documented
    // degenerate contract, unchanged.
    val grid = grid0.select(grid0.columns.map(col) ++
      targets.indices.map(i => max(col(s"_tt$i")).over(wAll).as(s"_T$i")) :+
      sum(col("_rc")).over(wAll).as("_R"): _*)
    val pMix = targets.zipWithIndex.map { case ((_, w), i) =>
      lit(w / wSum) * (coalesce(col(s"_tc$i"), lit(0L)) + alpha) /
        (col(s"_T$i") + alpha * buckets)
    }.reduce(_ + _)
    val model0 = grid
      .select(col("bucket"),
        (log(pMix) - log(col("_rc") + alpha)
          + log(col("_R") + alpha * buckets)).as("_lr"))
    val model = if (buckets <= (1 << 22)) broadcast(model0) else model0
    rawFeat.join(model, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("_lr")).as("dsir_logw"))
      .filter(col("dsir_logw").isNotNull)
  }

  /** Shared Gumbel-top-`k` pick over a `(idCol, dsir_logw)` score
    * frame: narrow top-k (a k-row heap per partition of 3-column
    * rows), then the k winners join back to the wide raw rows
    * (broadcast: k is the user's sample size), original column
    * order preserved. */
  private def gumbelPick(raw: DataFrame, scores: DataFrame,
                         idCol: String, k: Int, seed: String,
                         roundTo: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // u in (0, 1): (hash + 0.5) / 2^32 — both ln() calls finite.
    val u = (Sampling.keyHash(
        concat(lit(seed + ":"), col(idCol).cast("string"))) + 0.5) / U32
    val gumbel = -log(-log(u))
    val picked0 = scores
      .withColumn("dsir_key", Rounding.portable(col("dsir_logw") + gumbel, roundTo))
      .orderBy(col("dsir_key").desc, col(idCol))
      .limit(k)
    val picked = if (k <= (1 << 20)) broadcast(picked0) else picked0
    // Re-select the raw columns in their original order: the USING
    // join moves idCol to position 0, which would diverge from the
    // plugin's declared dry-run schema (original fields ++ the two
    // dsir columns) whenever idCol is not the first field.
    raw.join(picked, Seq(idCol))
      .select(raw.columns.map(col) ++
        Seq(col("dsir_logw"), col("dsir_key")): _*)
  }

  /** Gumbel-top-`k` importance resample: the selected documents with
    * `(…raw columns…, dsir_logw, dsir_key)`. `seed` varies the
    * (deterministic) Gumbel draw — a different seed is an independent
    * resample over the same weights. `roundTo` is the decimal grid
    * the selection key is snapped to before ranking (see class doc).
    */
  def select(raw: DataFrame, target: DataFrame, idCol: String,
             textCol: String, k: Int, buckets: Int = 8192,
             alpha: Double = 1.0, seed: String = "dsir",
             roundTo: Int = 4): DataFrame =
    gumbelPick(raw,
      scoreDocs(raw, target, idCol, textCol, buckets, alpha),
      idCol, k, seed, roundTo)

  /** Gumbel-top-`k` resample against a weighted MIXTURE of target
    * corpora ([[scoreDocsMix]]); selection mechanics identical to
    * [[select]]. */
  def selectMix(raw: DataFrame, targets: Seq[(DataFrame, Double)],
                idCol: String, textCol: String, k: Int,
                buckets: Int = 8192, alpha: Double = 1.0,
                seed: String = "dsir", roundTo: Int = 4): DataFrame =
    gumbelPick(raw,
      scoreDocsMix(raw, targets, idCol, textCol, buckets, alpha),
      idCol, k, seed, roundTo)
}
