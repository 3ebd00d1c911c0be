package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide n-gram heavy hitters — the frequent-collocation scan
  * behind boilerplate discovery ("subscribe to our newsletter"),
  * template detection, and contamination-candidate mining: the top-k
  * most repeated word n-grams with their document reach.
  *
  * Scale shape: one tokenize pass (the n-gram expansion is a
  * per-row `transform` over the token array — no join, no
  * positional self-join), one hash aggregation keyed on the gram
  * (partial map-side combine does the heavy lifting: frequent grams
  * collapse before the shuffle), and a `TakeOrderedAndProject`
  * top-k — the full gram vocabulary is never globally sorted.
  * Counts are integers, so ranking is exactly deterministic
  * cross-engine (count desc, gram asc).
  */
object Ngrams {

  /** Word n-grams of normalized `textCol` as an array column —
    * empty array when the document has fewer than `n` tokens.
    *
    * Built from `n` O(1) `element_at` probes per gram (not a
    * `slice` copy, which is O(len) per gram and turned long
    * documents quadratic — measured 3.4 s for the sf0.1 corpus vs
    * sub-second with probes); the token array is a named lambda
    * variable so normalization runs once per row. */
  def ngramArray(textCol: Column, n: Int): Column = {
    val gramsOf = (toks: Column) =>
      when(size(toks) >= n &&
          (lit(n > 1) || length(element_at(toks, 1)) > 0),
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ",
            (1 to n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    // transform over a 1-element wrapper = a let-binding: the split
    // token array is computed once and reused by every gram
    element_at(
      transform(array(split(Text.normalize(textCol), " ")), gramsOf), 1)
  }

  /** Corpus-wide top-`k` n-grams:
    * `(rank, ngram, n_occurrences, n_docs)` — total occurrence count
    * (duplicates within a doc counted) and distinct-document reach,
    * ranked by occurrences descending, gram ascending on ties. */
  def topNgrams(df: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    val grams = df
      .select(col(idCol).as("_id"),
        explode(ngramArray(col(textCol), n)).as("ngram"))
    val agg = grams.groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)
    // rank over the k surviving rows only (single tiny partition)
    val w = Window.orderBy(col("n_occurrences").desc, col("ngram").asc)
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "ngram", "n_occurrences", "n_docs")
  }
}
