package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate documents in a
  * deterministic order and chunk the token stream into fixed-budget
  * training sequences ("concat-and-chunk", the standard packing used
  * by GPT-style pipelines). Each doc is assigned the sequence its
  * FIRST token lands in plus its offset there — the bookkeeping a
  * downstream tokenizer needs to materialize packed examples.
  *
  * Scale shape: packing is per SHARD (`shardCols`) — a global order
  * would funnel 100 TB through one sort partition; sharding (by
  * lang/source/date, whatever the mix design says) keeps each window
  * sort bounded and shards independent. Within a shard the order is
  * `orderCol` (deterministic, so reruns repack identically).
  */
object Packing {

  /** Adds (seq_id, seq_offset) per doc: seq_id = which budget-sized
    * chunk of the shard's concatenated token stream this doc starts
    * in; seq_offset = its first token's position within that chunk. */
  def packChunks(df: DataFrame, tokensCol: String, budget: Int,
                 shardCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(orderCol))
    val cumBefore = coalesce(
      sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L))
    df.withColumn("_cum_before", cumBefore)
      .withColumn("seq_id", floor(col("_cum_before") / budget).cast("long"))
      .withColumn("seq_offset", (col("_cum_before") % budget).cast("long"))
      .drop("_cum_before")
  }
}
