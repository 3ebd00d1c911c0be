package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.VocabEncode

/** Vocabulary construction and token-id encoding — the bridge from a
  * cleaned text corpus to the integer sequences a trainer consumes.
  *
  * Whitespace tokens (lowercased) keep the operator engine-portable
  * and oracle-exact; a learned tokenizer (BPE merges) slots into the
  * same two stages — build a bounded table, broadcast it, encode in a
  * per-row pass.
  *
  * Scale shape: vocabulary construction is one partial-agg count +
  * top-k (`TakeOrderedAndProject` — never a global sort) collected to
  * the driver, bounded by `maxSize` regardless of corpus size.
  * Encoding is a shuffle-free projection against the broadcast map
  * ([[graft.expressions.VocabEncode]]).
  */
object Vocab {

  /** Top-`maxSize` tokens by frequency, id = dense rank in
    * (count DESC, token ASC) order — deterministic across engines and
    * partitionings. */
  def topTokens(df: DataFrame, textCol: String,
                maxSize: Int): Seq[(String, Long)] = {
    require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")
    df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(maxSize)
      .collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> i.toLong }.toSeq
  }

  /** Adds `outCol` = array<bigint> of token ids (OOV → `oovId`),
    * tokenizing `textCol` the same way the vocabulary was built. */
  def encode(df: DataFrame, textCol: String, vocab: Seq[(String, Long)],
             oovId: Long = -1L, outCol: String = "token_ids"): DataFrame = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (t, id) => m.put(t, id) }
    val bcast = df.sparkSession.sparkContext.broadcast(m)
    val toks = when(trim(col(textCol)) === "", array().cast("array<string>"))
      .otherwise(split(lower(trim(col(textCol))), "\\s+"))
    df.withColumn(outCol,
      VocabEncode.vocab_encode(toks, bcast, oovId))
  }
}
