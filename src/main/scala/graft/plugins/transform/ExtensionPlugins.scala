package graft.plugins.transform

import java.nio.file.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.core.PluginExecutionError
import graft.ops.{Dedup, Text}

/** Config-driven wrapper over the [[graft.ops.Dedup]] family, so
  * dedup runs as a pipeline transform:
  *
  *   method = "exact" | "fingerprint" | "minhash" | "simhash_pairs" |
  *            "ngram_pairs" | "embedding_pairs"
  */
class DedupPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "dedup"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    for {
      method <- requiredString("method")
      idCol <- requiredString("id_column")
      out <- graft.core.Errors.safe {
        method match {
          case "exact" =>
            val keys = options.get("key_columns") match {
              case Some(xs: Seq[_]) => xs.map(_.toString)
              case Some(s) => Seq(s.toString)
              case None => throw new PluginExecutionError(
                "Option 'key_columns' is required for method 'exact'")
            }
            Dedup.exact(df, idCol, keys)
          case "fingerprint" =>
            Dedup.byFingerprint(df, idCol, textColumn)
          case "minhash" =>
            Dedup.byMinhash(df, idCol, textColumn,
              threshold = numOpt("threshold", 0.8),
              shingleK = numOpt("shingle_k", 5).toInt,
              numHashes = numOpt("num_hashes", 64).toInt,
              bands = numOpt("bands", 16).toInt)
          case "simhash_pairs" =>
            Dedup.simhashPairs(df, idCol, textColumn,
              maxHamming = numOpt("max_hamming", 3).toInt)
          case "ngram_pairs" =>
            Dedup.ngramJaccardPairs(df, idCol, textColumn,
              n = numOpt("n", 3).toInt,
              threshold = numOpt("threshold", 0.5),
              blockCol = options.get("block_column").map(_.toString))
          case "embedding_pairs" =>
            Dedup.embeddingCosinePairs(df, idCol,
              options.getOrElse("embedding_column", "embedding").toString,
              threshold = numOpt("threshold", 0.95),
              planes = numOpt("planes", 8).toInt)
          case other => throw new PluginExecutionError(
            s"Unknown dedup method: '$other'")
        }
      }
    } yield out

  private def textColumn: String =
    options.getOrElse("text_column", "text").toString

  private def numOpt(key: String, default: Double): Double =
    options.get(key).map(_.toString.toDouble).getOrElse(default)

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    requiredString("method").flatMap { _ =>
      propagateSchema(schema)(df => execute(df).fold(e => throw e, identity))
    }
}

/** Config-driven wrapper over [[graft.ops.Text.analyze]]: attaches
  * token counts, quality metrics, language guess and fingerprint. */
class TextAnalysisPlugin(options: Map[String, Any], configDir: Path, label: String)
    extends BaseTransformPlugin(options, configDir, label) {
  def name: String = "text_analysis"

  def execute(df: DataFrame): Either[Throwable, DataFrame] =
    graft.core.Errors.safe(
      Text.analyze(df, options.getOrElse("text_column", "text").toString))

  def dryRun(schema: StructType): Either[Throwable, StructType] = {
    val tc = options.getOrElse("text_column", "text").toString
    if (!schema.fieldNames.contains(tc))
      Left(new graft.core.SchemaValidationError(
        s"Column '$tc' not found in schema"))
    else propagateSchema(schema)(df => Text.analyze(df, tc))
  }
}
