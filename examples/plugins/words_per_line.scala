// A user-authored plugin loaded STRAIGHT FROM THIS SOURCE FILE at
// pipeline start — no jar, no build step (see examples/
// custom_plugin.toml). The engine compiles it in-process against the
// running classpath and discovers the plugin class reflectively,
// mirroring the reference's runtime .py module loading.
import java.nio.file.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructType}

/** Adds `words_per_line`: mean whitespace-token count per non-empty
  * line — a cheap layout signal (prose reads ~10-20; navigation/menu
  * boilerplate reads ~1-3). Pure column expressions, so the derived
  * column stays inside whole-stage codegen and the filter that
  * follows it can still push down. */
class WordsPerLinePlugin(val options: Map[String, Any],
    val configDir: Path, override val label: String)
    extends graft.core.TransformPlugin {
  def name: String = "words_per_line"

  private def textCol: String =
    options.getOrElse("text_column", "text").toString

  def execute(df: DataFrame): Either[Throwable, DataFrame] = Right {
    val lines = filter(split(col(textCol), "\n"), l => trim(l) =!= "")
    val words = aggregate(lines, lit(0L),
      (acc, l) => acc + size(split(trim(l), "\\s+")))
    df.withColumn("words_per_line",
      when(col(textCol).isNull || size(lines) === 0, lit(0.0))
        .otherwise(words.cast("double") / size(lines)))
  }

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    if (!schema.fieldNames.contains(textCol))
      Left(new graft.core.SchemaValidationError(
        s"Column '$textCol' not found in schema"))
    else Right(schema.add("words_per_line", DoubleType))
}
