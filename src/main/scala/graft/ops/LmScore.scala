package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the CCNet-style
  * "perplexity against a reference LM" quality signal (Wenzek et al.
  * 2020 use a KenLM 5-gram; the same curation decision — rank/gate
  * documents by LM fit — works with a bigram model trained ON the
  * corpus itself, and that formulation is exactly reproducible in
  * SQL, so it stays under the cross-engine oracle).
  *
  * Model: add-k smoothed bigram,
  * `P(w2|w1) = (C(w1,w2) + k) / (C(w1) + k·V)`, with `V` the corpus
  * distinct-token count. A document's score is the mean log-prob of
  * its bigrams — higher = more typical of the corpus; the gate
  * drops the low tail (boilerplate-free garbage, wrong-language
  * fragments, mojibake score far from the corpus mode).
  *
  * Scale shape: one token explode into consecutive pairs (narrow
  * `(id, w1, w2)` rows, shuffle-free), then the model tables are
  * VOCABULARY-sized aggregates — `C(w1,w2)` and `C(w1)` collapse via
  * partial aggregation to at most |V|² and |V| rows, orders of
  * magnitude below corpus size, so AQE broadcasts them and the
  * corpus-side bigram rows are scored without ever being shuffled;
  * the only full pass over doc rows is the final per-doc mean
  * (partial-agg'd map-side). `V` is a 1-row aggregate cross-joined
  * in, never a driver constant.
  */
object LmScore {

  /** Consecutive-token pairs `(idCol, w1, w2)` over normalized text.
    * Documents with fewer than 2 tokens emit no rows. */
  def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col("_t"), " ")
    df.select(col(idCol), Text.normalize(col(textCol)).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("_toks")) - 2),
          i => struct(element_at(col("_toks"), i + 1).as("w1"),
            element_at(col("_toks"), i + 2).as("w2")))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
  }

  /** Per-document mean bigram log-probability:
    * `(idCol, n_bigrams, avg_logprob)` — one row per document with
    * ≥ 2 tokens. `addK` is the smoothing constant (1.0 = Laplace). */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                addK: Double = 1.0): DataFrame = {
    require(addK > 0, s"addK must be > 0, got $addK")
    val bg = bigramRows(df, idCol, textCol)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("_n12"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("_n1"))
    // V = corpus distinct tokens (bigram endpoints cover every token
    // of every scored doc except... nothing: both w1 and w2 ranges).
    val v = Tfidf.termRows(df, idCol, textCol)
      .agg(countDistinct(col("term")).as("_v"))
    bg.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(v)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        avg(log((col("_n12") + addK) /
          (col("_n1") + col("_v") * addK))).as("avg_logprob"))
  }

  /** Gate: keep documents whose mean bigram log-prob is at or above
    * `minAvgLogprob` (documents too short to score — fewer than 2
    * tokens — are dropped: no evidence, no pass, the conservative
    * direction for a quality gate). */
  def filterByScore(df: DataFrame, idCol: String, textCol: String,
                    minAvgLogprob: Double, addK: Double = 1.0): DataFrame = {
    val scores = scoreDocs(df, idCol, textCol, addK)
      .filter(col("avg_logprob") >= minAvgLogprob)
      .select(col(idCol))
    df.join(scores, Seq(idCol), "left_semi")
  }
}
