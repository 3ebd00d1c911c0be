package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{size => arrLen, _}

/** Sliding-window document chunking — the step between a cleaned
  * corpus and a training set: long documents become overlapping
  * windows of `size` tokens advancing by `stride` (overlap =
  * size − stride), so no span longer than the context length is lost
  * and boundary context is preserved.
  *
  * Whitespace tokens, not BPE: the window arithmetic is identical and
  * whitespace keeps the operator engine-portable (the hash oracle
  * recomputes it verbatim in DuckDB); a real tokenizer slots into the
  * same shape as a pre-pass producing an array column.
  *
  * Scale shape: pure per-row narrow work — one split, one
  * `explode(sequence(...))`, one slice per emitted chunk; no shuffle,
  * no state, embarrassingly parallel, and the output inherits the
  * input partitioning. Chunk explosion multiplies rows by
  * ~n_tokens/stride, so writers downstream should bound file sizes
  * (`max_records_per_file`) rather than this operator buffering
  * anything.
  */
object Chunking {

  /** Explode each document into (idCol, chunk_id, n_chunk_tokens,
    * chunk_text). Chunks start at 0, stride, 2·stride, … while the
    * start is inside the document; the last chunk may be short, and
    * chunks shorter than `minTokens` are dropped (trailing fragments
    * that duplicate the previous window's suffix). Blank/NULL text
    * yields no chunks. */
  def slidingWindow(df: DataFrame, idCol: String, textCol: String,
                    size: Int, stride: Int,
                    minTokens: Int = 1): DataFrame = {
    require(size >= 1, s"size must be >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size], got $stride (size $size)")
    val tokens = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), tokens.as("_toks"))
      .filter(arrLen(col("_toks")) > 0 && col("_toks")(0) =!= "")
      .select(col(idCol), col("_toks"),
        explode(sequence(lit(0),
          arrLen(col("_toks")) - 1, lit(stride))).as("_start"))
      .select(col(idCol),
        (col("_start") / stride).cast("long").as("chunk_id"),
        slice(col("_toks"), col("_start") + 1, lit(size)).as("_w"))
      .select(col(idCol), col("chunk_id"),
        arrLen(col("_w")).cast("long").as("n_chunk_tokens"),
        array_join(col("_w"), " ").as("chunk_text"))
      .filter(col("n_chunk_tokens") >= minTokens)
  }
}
