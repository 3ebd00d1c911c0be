package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-hashing text embeddings (the hashing trick, Weinberger
  * et al., ICML 2009): each token hashes to a dimension and a sign;
  * a document's vector is the signed token-count histogram, L2
  * normalized. No model, no vocabulary, no driver state — a pure
  * per-row computation that gives every document a comparable dense
  * vector, which is what lets the ANN/dedup embedding family run on
  * corpora that ship no embeddings at all.
  *
  * Engine determinism is EXACT, not approximate: dimensions and
  * signs derive from md5 (the repo's cross-engine hash), per-dim
  * totals are integer sums of ±1, the norm is one IEEE sqrt of an
  * integer and one division — every value is bit-identical in any
  * IEEE engine, no rounding argument needed.
  *
  * Scale shape: one token explode, one (id, dim) aggregation, one
  * per-doc regroup to a dense array — two key shuffles, vocabulary
  * never materialized anywhere. */
object HashEmbed {

  /** `(idCol, embedding array<double> of length d)` per document with
    * non-empty normalized text. All-cancelled (zero) vectors stay
    * zero rather than dividing by zero. */
  def embed(df: DataFrame, idCol: String, textCol: String,
            d: Int = 64): DataFrame = {
    require(d >= 2 && d <= 4096, s"d must be in [2, 4096], got $d")
    val toks = df
      .select(col(idCol), Text.normalize(col(textCol)).as("_t"))
      .filter(length(col("_t")) > 0)
      .select(col(idCol), explode(split(col("_t"), " ")).as("term"))
    // first 32 md5 bits -> dimension (mod d) + sign (next bit band)
    val hashed = toks
      .withColumn("_h", conv(substring(md5(col("term")), 1, 8), 16, 10)
        .cast("long"))
      .withColumn("_dim", (col("_h") % d).cast("int"))
      .withColumn("_s",
        when(expr(s"(_h div $d) % 2") === 0, 1L).otherwise(-1L))
    val sums = hashed.groupBy(col(idCol), col("_dim"))
      .agg(sum(col("_s")).as("_v"))
    val dense = sums.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("_dim"), col("_v"))))
        .as("_m"))
      .withColumn("_raw", transform(sequence(lit(0), lit(d - 1)),
        i => coalesce(element_at(col("_m"), i.cast("int")), lit(0L))
          .cast("double")))
    dense.select(col(idCol),
      when(Similarity.norm(col("_raw")) === 0.0, col("_raw"))
        .otherwise(Similarity.normalized(col("_raw"))).as("embedding"))
  }
}
