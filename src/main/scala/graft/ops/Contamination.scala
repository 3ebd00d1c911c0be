package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents sharing
  * word n-grams with a benchmark/eval set — the standard
  * decontamination pass before training (n-gram overlap à la the
  * GPT-3/PaLM dedup appendices; typically n = 8-13 words).
  *
  * Scale shape: the benchmark side is SMALL by definition (eval sets,
  * not corpora), so its exploded distinct n-grams broadcast; the
  * corpus side streams through one explode + broadcast-hash-join +
  * partial-agg count — no shuffle of corpus text, no all-pairs
  * anything. At 100 TB the corpus explode is the only big term and it
  * is embarrassingly parallel.
  *
  * N-grams are joined as strings here so the result is exactly
  * reproducible in the DuckDB oracle; a production run would hash
  * them (xxhash64) to shrink the join key — same plan shape.
  */
object Contamination {

  /** (idCol, n_overlap, n_bench_docs) for every corpus doc sharing at
    * least one word n-gram with the benchmark. n_overlap counts
    * (doc-gram, bench-doc) matches; n_bench_docs counts distinct
    * benchmark documents hit. */
  def ngramOverlap(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 8): DataFrame = {
    // wordShingles normalizes internally; staged projection so the
    // normalize+split runs once per row, not once per gram
    val corpusGrams = corpus
      .select(col(idCol), Dedup.wordShingles(col(textCol), n).as("_gs"))
      .select(col(idCol), explode(col("_gs")).as("_g"))
    val benchGrams = bench
      .select(col(benchIdCol).as("_bench_id"),
        Dedup.wordShingles(col(benchTextCol), n).as("_gs"))
      .select(col("_bench_id"), explode(col("_gs")).as("_g"))
      .distinct()
    corpusGrams
      .join(broadcast(benchGrams), Seq("_g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"),
        count_distinct(col("_bench_id")).as("n_bench_docs"))
  }

  /** Decontamination: drop every corpus doc whose benchmark n-gram
    * overlap reaches `minOverlap` (1 = any shared n-gram, the strict
    * standard). The flagged id set is USUALLY tiny relative to the
    * corpus, but it is corpus-derived and unbounded by contract (a
    * corpus that quotes the benchmark heavily flags a large
    * fraction) — so the anti-join carries NO broadcast hint: the
    * flagged rows are skinny ids and AQE upgrades the join to
    * broadcast from their MEASURED size when they really are small,
    * without the forced-broadcast cliff when they aren't. */
  def removeContaminated(corpus: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchIdCol: String,
                         benchTextCol: String, n: Int = 8,
                         minOverlap: Long = 1L): DataFrame = {
    val flagged = ngramOverlap(corpus, idCol, textCol,
        bench, benchIdCol, benchTextCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col(idCol))
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
