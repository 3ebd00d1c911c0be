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
    * empty array when the document has fewer than `n` tokens. */
  def ngramArray(textCol: Column, n: Int): Column = {
    val toks = split(Text.normalize(textCol), " ")
    when(size(toks) >= n && length(Text.normalize(textCol)) > 0,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
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
