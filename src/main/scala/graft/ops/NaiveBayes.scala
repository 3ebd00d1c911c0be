package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier, trained and applied
  * entirely as DataFrame aggregations — the model-based quality
  * filter of real pretraining pipelines (CCNet / RedPajama style:
  * heuristic weak labels on a slice, a linear bag-of-words model
  * scores the rest of the corpus). Mirrors the capability face of
  * the reference's transform vocabulary (cryoflow docs
  * `plugin_development.md` transform section) without any
  * counterpart there — this is a beyond-reference pipeline operator.
  *
  * Model: class priors `log(docs_c / docs_total)` + per-token
  * add-one-smoothed likelihoods `log((n_{t,c}+1)/(N_c+V))` over the
  * TRAIN vocabulary (V = distinct train terms). Test tokens unseen
  * in training are skipped (the standard convention; a dense OOV
  * floor would differ per class only through the denominators and
  * adds no signal). Test documents whose tokens are ALL unseen still
  * predict — priors alone via the dense class fan-out.
  *
  * Cross-engine determinism (the oracle replays this in DuckDB):
  * per-(doc, class) scores are rounded with the shared fixed-point
  * `r(x, p)` BEFORE the argmax, so both engines rank bit-identical
  * values; exact rounded ties break by label ascending. `ln` last-bit
  * noise across libm implementations is ~1e-13 absolute after a
  * 100-token sum — 9 orders under the p=4 rounding grid.
  *
  * Scale shape (100 TB): one token explode over train + one over
  * test; model state is a V×C aggregate (vocabulary-sized, NOT
  * corpus-sized) that lives in the plan as a join side — AQE
  * broadcasts it when small, shuffles on `term` when not; scoring is
  * one hash aggregation keyed (doc, class) and one C-row-per-doc
  * window argmax. No collect, no driver state, no UDFs.
  */
object NaiveBayes {

  private def r(c: org.apache.spark.sql.Column, p: Int) = {
    val f = math.pow(10, p)
    floor(c * f + 0.5 + 1e-6) / f
  }

  /** Exploded (idCol, labelCol?, term) rows over normalized text;
    * empty-after-normalize docs emit no rows (same contract as
    * [[Tfidf.termRows]]). */
  private def toks(df: DataFrame, idCol: String, textCol: String,
                   keep: Seq[String]): DataFrame =
    df.select((col(idCol) +: keep.map(col)) :+
        Text.normalize(col(textCol)).as("_t"): _*)
      .filter(length(col("_t")) > 0)
      .select((col(idCol) +: keep.map(col)) :+
        explode(split(col("_t"), " ")).as("term"): _*)

  /** Train on `train` (idCol, textCol, labelCol), predict `test`
    * (idCol, textCol): returns `(idCol, pred, score)` with `score`
    * the winning class's rounded posterior log-score. Documents that
    * normalize to empty text are excluded from both sides (no token
    * evidence, no row — callers wanting priors-only rows should keep
    * a sentinel token). */
  def trainPredict(train: DataFrame, test: DataFrame, idCol: String,
                   textCol: String, labelCol: String,
                   roundDecimals: Int = 4): DataFrame = {
    val trainToks = toks(train, idCol, textCol, Seq(labelCol))
    val testToks = toks(test, idCol, textCol, Seq.empty)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("cnt"))

    // class-conditional token counts (V×C sparse); class totals and
    // the vocabulary DERIVE from this aggregate rather than
    // re-aggregating the exploded stream — the (label, term) shuffle
    // is computed once and every consumer plans a ReusedExchange on
    // it (one corpus explode instead of four)
    val tokCounts = trainToks.groupBy(col(labelCol), col("term"))
      .agg(count(lit(1)).as("n_tc"))
    val classTotals = tokCounts.groupBy(col(labelCol))
      .agg(sum(col("n_tc")).as("n_c"))
    // per-class doc counts for priors
    val classDocs = train
      .filter(length(Text.normalize(col(textCol))) > 0)
      .groupBy(col(labelCol)).agg(count(lit(1)).as("docs_c"))

    // dense (term, class) likelihood table over the TRAIN vocabulary:
    // vocab × classes, missing counts -> 0 -> the smoothing floor.
    // Scalar-attach fusion (round 15, guide §3.3/§2.4): the 1-row
    // scalar aggregates ride on the TINY frames, never on a
    // vocab/corpus-sized probe — v_size crossJoins the C-row
    // classTotals BEFORE the vocab fan-out (one C-row build instead
    // of a second vocab-wide nested-loop pass), and docs_n is a
    // window sum OVER classDocs itself (the old separate
    // totalDocs aggregate re-planned the whole classDocs subtree
    // behind a second 1-row cross join).
    val vocab = tokCounts.select(col("term")).distinct()
    val vocabSize = vocab.agg(count(lit(1)).as("v_size"))
    // cross joins MUST broadcast one side; hint the PROVABLY tiny
    // ones (C rows / 1 row) so the planner can never pick the
    // corpus-derived side at scale
    val classTotalsV = classTotals.crossJoin(broadcast(vocabSize))
    val dense = vocab
      .crossJoin(broadcast(classTotalsV))
      .join(tokCounts, Seq("term", labelCol), "left")
      .select(col("term"), col(labelCol),
        log((coalesce(col("n_tc"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_c") + col("v_size"))).as("loglik"))

    val priors = classDocs
      .withColumn("docs_n", sum(col("docs_c")).over(Window.partitionBy()))
      .select(col(labelCol),
        log(col("docs_c").cast("double") / col("docs_n")).as("logprior"))

    // token evidence per (doc, class); OOV test terms drop at the join
    val evidence = testToks
      .join(dense, Seq("term"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("cnt") * col("loglik")).as("tok_score"))

    // dense doc × class fan-out so all-OOV docs still score (priors).
    // SHUFFLE_HASH on the evidence attach (the round-13 measured
    // uniform-id rule): both sides key on (doc, class) — uniform,
    // agg-deduped — so the per-partition hash build is bounded at
    // n/P single rows while sort-merge would SORT the test-corpus-
    // sized fan-out stream; and the post-agg size estimate is
    // fabricated, so an unpinned join is static-broadcast bait.
    val testIds = testToks.select(col(idCol)).distinct()
    val scored = testIds.crossJoin(broadcast(priors))
      .join(evidence.hint("SHUFFLE_HASH"), Seq(idCol, labelCol), "left")
      .select(col(idCol), col(labelCol),
        r(col("logprior") + coalesce(col("tok_score"), lit(0.0)),
          roundDecimals).as("score"))

    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col(labelCol).asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(labelCol).as("pred"), col("score"))
  }

  /** Per train-vocabulary term: class counts, the exact-rational
    * smoothed odds ratio (the deterministic rank key — see
    * [[Tfidf]]'s determinism note for why rank never touches `ln`),
    * and the log-odds weight `ln(p_a) − ln(p_b)`. Shared by
    * [[featureOdds]] and [[logOddsModel]]. */
  private def termOdds(train: DataFrame, textCol: String,
                       labelCol: String, labelA: String,
                       labelB: String): DataFrame = {
    val trainToks = toks(train.select(col(labelCol), col(textCol))
        .withColumn("_id", monotonically_increasing_id()),
      "_id", textCol, Seq(labelCol))
    val counts = trainToks
      .groupBy(col("term"))
      .agg(
        sum(when(col(labelCol) === labelA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(labelCol) === labelB, 1L).otherwise(0L)).as("n_b"))
    // totals derive from `counts` (ReusedExchange on the term
    // shuffle), not from a second pass over the exploded corpus
    val totals = counts.agg(
      sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"),
      count(lit(1)).as("v_size"))
    counts.crossJoin(broadcast(totals)).select(
      col("term"), col("n_a"), col("n_b"),
      (((col("n_a") + lit(1L)).cast("double") /
        (col("tot_a") + col("v_size"))) *
        ((col("tot_b") + col("v_size")).cast("double") /
          (col("n_b") + lit(1L)))).as("odds_exact"),
      (log((col("n_a") + lit(1L)).cast("double") /
          (col("tot_a") + col("v_size"))) -
        log((col("n_b") + lit(1L)).cast("double") /
          (col("tot_b") + col("v_size")))).as("w"))
  }

  /** Two-class feature diagnostics: per train-vocabulary term, the
    * smoothed class-conditional odds ratio
    * `((n_a+1)/(N_a+V)) / ((n_b+1)/(N_b+V))` for `labelA` over
    * `labelB`. The RANK key is that exact rational computed by a
    * fixed IEEE expression shape (two divisions, one multiply —
    * bit-identical in any IEEE engine); ties break term ascending.
    * Returns top-`k`: (rank, term, n_a, n_b, odds). */
  def featureOdds(train: DataFrame, textCol: String, labelCol: String,
                  labelA: String, labelB: String, k: Int,
                  roundDecimals: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val odds = termOdds(train, textCol, labelCol, labelA, labelB)
    // top-k first (plans TakeOrderedAndProject — distributed), THEN
    // the rank window runs over only k rows; a global row_number over
    // the full vocabulary would single-partition vocabulary-sized data
    val topK = odds.orderBy(col("odds_exact").desc, col("term").asc)
      .limit(k)
    val w = Window.orderBy(col("odds_exact").desc, col("term").asc)
    topK.withColumn("rank", row_number().over(w))
      .select(col("rank").cast("long").as("rank"), col("term"),
        col("n_a"), col("n_b"),
        r(col("odds_exact"), roundDecimals).as("odds"))
  }

  /** Bounded DEPLOYABLE two-class model: the ln prior odds
    * `ln(docs_a) − ln(docs_b)` plus the `maxTerms` most
    * class-discriminating per-term log-odds weights — feature
    * selection by the exact-rational deviation key
    * `greatest(odds, 1/odds)` (term-asc ties), so the selected set is
    * engine-deterministic. Small enough to ride along as a plan
    * literal, which is what makes [[scoreWithModel]] a STATELESS
    * per-row transform: no join, no shuffle, no streaming state — the
    * shape a classifier needs to score an unbounded stream (or a
    * 100 TB scan) at wire speed. The two aggregations here are
    * vocabulary-sized; only `maxTerms` rows reach the driver. */
  def logOddsModel(train: DataFrame, textCol: String, labelCol: String,
                   labelA: String, labelB: String,
                   maxTerms: Int = 64): (Double, Seq[(String, Double)]) = {
    require(maxTerms >= 1 && maxTerms <= 100000,
      s"maxTerms must be in [1, 100000], got $maxTerms")
    val odds = termOdds(train, textCol, labelCol, labelA, labelB)
    val weights = odds
      .orderBy(greatest(col("odds_exact"),
        lit(1.0) / col("odds_exact")).desc, col("term").asc)
      .limit(maxTerms)
      .select(col("term"), col("w"))
      .collect().map(row => (row.getString(0), row.getDouble(1))).toSeq
    val docCounts = train
      .filter(length(Text.normalize(col(textCol))) > 0)
      .agg(
        sum(when(col(labelCol) === labelA, 1L).otherwise(0L)).as("da"),
        sum(when(col(labelCol) === labelB, 1L).otherwise(0L)).as("db"))
      .collect()(0)
    val prior = math.log(docCounts.getLong(0).toDouble) -
      math.log(docCounts.getLong(1).toDouble)
    (prior, weights)
  }

  /** Stateless scoring with a [[logOddsModel]]: adds `score`
    * (r()-rounded prior + Σ token-weight over the model map, token
    * order — a fixed fold both engines replay identically after
    * rounding) and `pred` (`labelA` iff score ≥ 0, the deterministic
    * boundary convention). Works unchanged on a streaming DataFrame —
    * the model is a map literal, so the plan has no join and no
    * state. */
  def scoreWithModel(df: DataFrame, textCol: String, prior: Double,
                     weights: Seq[(String, Double)], labelA: String,
                     labelB: String, roundDecimals: Int = 4): DataFrame = {
    val m = map(weights.flatMap { case (t, w) => Seq(lit(t), lit(w)) }: _*)
    val toksArr = split(Text.normalize(col(textCol)), " ")
    val raw = lit(prior) + aggregate(toksArr, lit(0.0),
      (acc, tk) => acc + coalesce(element_at(m, tk), lit(0.0)))
    df.withColumn("score", r(raw, roundDecimals))
      .withColumn("pred",
        when(col("score") >= 0, labelA).otherwise(labelB))
  }
}
