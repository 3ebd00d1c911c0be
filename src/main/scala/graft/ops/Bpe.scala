package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * learned-subword step a pretraining pipeline runs between corpus
  * cleaning and sequence packing.
  *
  * Split of labor mirrors the ANN trainers ([[KMeansLite]]): TRAINING
  * is a bounded driver-side loop over a deterministic hash-ordered
  * sample (merge learning is inherently sequential — each round's
  * counts depend on the previous round's merges — and a few thousand
  * sampled documents saturate subword statistics), while ENCODING is
  * the distributed, corpus-wide path: a broadcast merge table and a
  * per-row Catalyst kernel ([[graft.expressions.BpeEncode]]),
  * shuffle-free at any corpus size.
  */
object Bpe {

  /** Learn `numMerges` merge pairs from word frequencies of a bounded
    * deterministic sample (hash-ordered, like the ANN training
    * samples — unbiased by id order). Classic BPE training: per
    * round, count adjacent symbol pairs weighted by word frequency,
    * merge the most frequent everywhere (ties broken lexicographically
    * for determinism), stop early when the best pair drops under
    * `minPairCount`. Returns merges in rank order. */
  def train(df: DataFrame, textCol: String, numMerges: Int = 200,
            sampleN: Int = 2048, minPairCount: Long = 2L): Seq[(String, String)] = {
    val texts = df
      .select(Text.normalize(col(textCol)).as("_t"))
      .filter(col("_t").isNotNull && col("_t") =!= "")
      .orderBy(xxhash64(col("_t")), col("_t")).limit(sampleN)
      .collect().map(_.getString(0))

    // word -> (symbols, frequency)
    val wordFreq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    texts.foreach(_.split(' ').foreach { w =>
      if (w.nonEmpty) wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L)
    })
    var words: Vector[(Vector[String], Long)] = wordFreq.iterator.map {
      case (w, f) =>
        w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) -> f
    }.toVector

    def mergeAll(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += a + b; i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (best, n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < minPairCount) exhausted = true
        else {
          merges += best
          words = words.map { case (syms, f) =>
            mergeAll(syms, best._1, best._2) -> f
          }
        }
      }
      round += 1
    }
    merges.result()
  }

  /** Attach `out` = BPE token array of `textCol` (normalized with
    * [[Text.normalize]], the same staging as the dedup kernels).
    * The merge table is broadcast once per job. */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
             out: String = "tokens"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      merges.map(p => Array(p._1, p._2)).toArray)
    df.withColumn("_bpe_norm", Text.normalize(col(textCol)))
      .withColumn(out, graft.expressions.BpeEncode.bpe_encode(col("_bpe_norm"), bc))
      .drop("_bpe_norm")
  }

  /** Attach `out` = the TOKENIZER-TRUE token count of `textCol`
    * under the trained merge table — the budget column sequence
    * packing should count when training sequences are measured in
    * real BPE tokens rather than whitespace words (a whitespace
    * count under-budgets by the subword blow-up factor and the
    * packed sequences overflow the model's context at train time).
    * The token ARRAY is a projection-local intermediate (size() of
    * the kernel output) — only the count column persists, so the
    * corpus-wide pass stays shuffle-free and nothing array-sized is
    * retained or shuffled. NULL text → NULL count (matches
    * [[encode]]'s NULL propagation); blank → 0. */
  def withTokenCount(df: DataFrame, textCol: String,
                     merges: Seq[(String, String)],
                     out: String = "n_tokens_bpe"): DataFrame =
    encode(df, textCol, merges, out = "_bpe_toks")
      .withColumn(out, size(col("_bpe_toks")).cast("long"))
      .withColumn(out,
        when(col("_bpe_toks").isNull, lit(null).cast("long"))
          .otherwise(col(out)))
      .drop("_bpe_toks")
}
