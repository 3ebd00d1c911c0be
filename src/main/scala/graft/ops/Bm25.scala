package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 ranked retrieval over a document table — the lexical search
  * baseline (Robertson & Zaragoza 2009) every corpus-curation stack
  * keeps next to its embedding ANN: benchmark-query decontamination
  * triage, seed-document expansion, and quality auditing all start
  * from "which documents does this query actually hit".
  *
  * Score of document `d` for query `q`:
  * `Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
  * with the Lucene-shaped non-negative idf
  * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`, `dl` the document
  * token count and `avgdl = Σdl / N` (empty documents count in `N`
  * and contribute 0 length).
  *
  * Scale shape: the query set is tiny and BROADCAST (both the term
  * match and the per-query top-k are bounded by it); the corpus is
  * touched by exactly one tokenize/explode pass feeding two hash
  * aggregations (per-doc `tf` over query terms only — the broadcast
  * semi-join prunes before the shuffle — and per-doc length), plus a
  * 1-row corpus aggregate for `(N, avgdl)` cross-joined in, never a
  * driver constant. The per-query top-k window plans as
  * `WindowGroupLimit`, pruned map-side.
  *
  * Determinism (cross-engine oracle): ranking orders by the raw
  * score descending with `doc id` as tie-break. Exact real-score
  * ties come from equal `(tf, df, dl)` term profiles, which produce
  * bit-identical doubles within each engine, so the tie-break
  * decides identically everywhere; the emitted score is rounded by
  * the caller for hashing.
  */
object Bm25 {

  /** Per-query BM25 top-`k`:
    * `(query_id, rank, <idCol>, score)`, rank 1 = best. Documents
    * sharing no term with the query emit no row. `queries` is an
    * in-memory `(query_id, query_text)` list — the broadcast side;
    * query text goes through the same [[Text.normalize]] + split
    * tokenization as the corpus.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(queries.nonEmpty, "need at least one query")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"k1 must be >= 0 and b in [0,1], got k1=$k1 b=$b")
    val spark = docs.sparkSession
    val qdf = queryTerms(spark, queries)

    val terms = Tfidf.termRows(docs, idCol, textCol)
    // per-doc length over ALL terms (BM25 length-normalizes against
    // the full document, not just matched terms)
    val dl = terms.groupBy(col(idCol)).agg(count(lit(1)).as("_dl"))
    // (N, avgdl) in one corpus-count pass; avgdl over all N docs
    val stats = docs.agg(count(lit(1)).as("_n"))
      .crossJoin(dl.agg(sum(col("_dl")).as("_sumdl")))
      .select(col("_n"), (col("_sumdl").cast("double") / col("_n")).as("_avgdl"))
    // tf restricted to query terms: broadcast semi-join BEFORE the
    // tf aggregation so only matching tokens shuffle
    val matched = terms.join(
      broadcast(qdf.select("term").distinct()), Seq("term"), "left_semi")
    val tf = matched.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("_df")) // one row per (doc, term) → doc count

    val perTerm = tf
      .join(broadcast(qdf), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(stats)
      .select(col("query_id"), col(idCol),
        (log(lit(1.0) +
            (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))) *
          (col("_tf") * lit(k1 + 1.0)) /
          (col("_tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("_dl") / col("_avgdl"))))
          .as("_s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol).asc)
    perTerm.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("_s")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col(idCol), col("score"))
  }

  /** `(query_id, term)` rows — DISTINCT terms per query, tokenized
    * exactly like the corpus. */
  private def queryTerms(spark: SparkSession,
                         queries: Seq[(String, String)]): DataFrame = {
    val rows = queries.map { case (qid, qt) => Row(qid, qt) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField("query_id", StringType, nullable = false),
          StructField("qtext", StringType, nullable = false))))
      .select(col("query_id"), Text.normalize(col("qtext")).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col("query_id"), explode(split(col("_t"), " ")).as("term"))
      .distinct()
  }
}
