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
  * `orderCol` — which must totally order each shard's rows (unique
  * within shard, doc_id-like): with ties, [[packGreedy]]'s scan sees
  * tied rows in arbitrary post-shuffle order and the rerun-identical
  * guarantee is void ([[packChunks]]'s RANGE-frame window gives tied
  * rows equal cumulative offsets instead — deterministic, but ties
  * then share seq_offset).
  * Parallelism equals the distinct shard count, so at cluster scale
  * include a fine-grained deterministic bucket in `shardCols` — e.g.
  * [[Sampling.shuffleShard]]'s `shard` column — rather than packing
  * per coarse source/lang: 5 langs = 5 tasks, 5 langs × 2048 hash
  * shards = full cluster. Sequences never span shards either way.
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

  /** No-split greedy packing (the SFT/instruct-data mode, where a
    * document must land whole in one training sequence): walk the
    * shard's docs in `orderCol` order, appending each to the current
    * sequence unless that would overflow `budget` — then start a new
    * one. A doc longer than the budget gets a sequence of its own.
    * Adds (seq_id, seq_offset), both reset per shard.
    *
    * Greedy packing has a sequential dependency (each decision needs
    * the running fill), so it is NOT a window function; this is the
    * genuine per-partition imperative case — one repartition on
    * `shardCols`, a within-partition sort, and a single O(1)-memory
    * streaming scan per shard. Parallelism = shard count, exactly as
    * [[packChunks]]'s window; results are deterministic because the
    * scan state resets on every shard-key change regardless of how
    * shards co-locate into partitions. */
  def packGreedy(df: DataFrame, tokensCol: String, budget: Int,
                 shardCols: Seq[String], orderCol: String): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardCols.nonEmpty, "shardCols must be non-empty")
    val parted = df.repartition(shardCols.map(col): _*)
      .sortWithinPartitions((shardCols :+ orderCol).map(col): _*)
    val schema = parted.schema
    // overwrite-in-place semantics, matching packChunks' withColumn:
    // a frame that already carries seq_id/seq_offset (a prior pack
    // run) is re-packed — the old values stay readable as
    // tokensCol/orderCol/shardCols during the scan and are replaced
    // in the output, never duplicated
    val longField = (n: String) => org.apache.spark.sql.types
      .StructField(n, org.apache.spark.sql.types.LongType, nullable = false)
    // case-INsensitive match, like the analyzer's default column
    // resolution (and withColumn's replace): a prior 'Seq_Id' is
    // overwritten, not shadowed by a second lowercase column
    def place(s: org.apache.spark.sql.types.StructType, n: String) = {
      val i = s.fieldNames.indexWhere(_.equalsIgnoreCase(n))
      if (i >= 0)
        org.apache.spark.sql.types.StructType(s.updated(i, longField(n)))
      else org.apache.spark.sql.types.StructType(s :+ longField(n))
    }
    val outSchema = place(place(schema, "seq_id"), "seq_offset")
    val seqIdx = outSchema.fieldNames.indexWhere(_.equalsIgnoreCase("seq_id"))
    val offIdx = outSchema.fieldNames.indexWhere(_.equalsIgnoreCase("seq_offset"))
    val nIn = schema.length
    val tokIdx = schema.fieldIndex(tokensCol)
    val shardIdx = shardCols.map(schema.fieldIndex)
    parted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var seq = 0L
      var fill = 0L
      var started = false
      it.map { row =>
        val key = shardIdx.map(row.get)
        val v = row.get(tokIdx)
        val tok = if (v == null) 0L else v.asInstanceOf[Number].longValue
        var offset = 0L
        // the fill >= budget clause only fires for a ZERO-token doc
        // arriving at an exactly-full sequence: it opens the next
        // sequence instead of landing at offset == budget, keeping
        // the invariant seq_offset ∈ [0, budget) (oversized docs sit
        // alone at offset 0)
        if (!started || key != curKey) {
          curKey = key; seq = 0L; fill = tok; started = true
        } else if (fill + tok > budget || fill >= budget) {
          seq += 1L; fill = tok
        } else {
          offset = fill; fill += tok
        }
        val out = new Array[Any](outSchema.length)
        var i = 0
        while (i < nIn) { out(i) = row.get(i); i += 1 }
        out(seqIdx) = seq
        out(offIdx) = offset
        org.apache.spark.sql.Row.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
