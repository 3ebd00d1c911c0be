package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document table: per-document
  * top-k terms by term-frequency × rarity — the classic relevance
  * surface for corpus exploration, near-dup triage and quality
  * auditing.
  *
  * Determinism note (why ranking avoids `ln`): ranking on
  * `tf·ln(N/df)` is not portable — algebraic coincidences
  * (`2·ln 4 = 4·ln 2`) give genuinely equal real scores whose
  * floating `ln` spellings differ in the last bit per engine, so two
  * engines can pick different "top" terms and a hash oracle breaks.
  * The ranking key here is `tf/df`: one IEEE division of two small
  * integers, bit-identical in any IEEE engine, with exactly-equal
  * rationals tie-broken by term. That ordering IS a tf-idf family
  * member (linear idf `N/df` instead of log — the same document-wise
  * monotonicity in tf and 1/df); the familiar smoothed log score is
  * still EMITTED (rounded) for consumers, it just doesn't decide
  * rank.
  *
  * Scale shape: one token explode, two hash aggregations (doc-term
  * tf, term df), a join on `term` (hash-partitioned both sides; AQE
  * broadcasts the vocabulary side when it is small), and one window
  * per doc whose `rank <= k` filter plans as `WindowGroupLimit` —
  * pruned map-side before the per-doc sort. Corpus size `N` is a
  * 1-row aggregate cross-joined in, not a driver constant.
  */
object Tfidf {

  /** Exploded `(idCol, term)` token rows over normalized text
    * (duplicates preserved — term frequency is the point). */
  def termRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.normalize(col(textCol)).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col(idCol), explode(split(col("_t"), " ")).as("term"))

  /** Per-document top-`k` terms:
    * `(idCol, rank, term, tf, df, tfidf)` where `tfidf` is the
    * smoothed-log display score `tf · (ln((1+N)/(1+df)) + 1)` and
    * rank order is by `tf/df` descending (see class doc), term
    * ascending on exact ties. Documents with no tokens emit no rows.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = termRows(df, idCol, textCol)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(n)
      .withColumn("tfidf",
        col("tf") * (log((lit(1L) + col("_n")).cast("double") /
          (lit(1L) + col("df"))) + 1.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("term"),
        col("tf"), col("df"), col("tfidf"))
  }
}
