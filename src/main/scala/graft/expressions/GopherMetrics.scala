package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All raw Gopher-rule metrics in ONE per-row pass — the kernel-tier
  * replacement for the interpreted HOF formulation in
  * `Text.withGopherFlags` (three `filter` lambdas, an `aggregate`,
  * and an `array_intersect` per row measured ~5 ms/doc at sf0.1; this
  * pass is microseconds). Semantics are pinned to the Column form the
  * DuckDB oracle (`q_gopher_rules`) recomputes:
  *
  *  - tokens = `split(lower(trim(text)), "\s+")` with Spark's
  *    limit=-1 split (trailing empties kept), empty when the
  *    space-trimmed text is empty; n_words counts ALL split tokens.
  *  - lines  = `split(text, "\n")` of the RAW text.
  *  - lengths are CODEPOINT counts (Spark `length`, DuckDB `length`).
  *  - symbol occurrences are non-overlapping left-to-right counts of
  *    '#', '...', '…' over the raw text (the `replace` formulation).
  *  - bullet/ellipsis tests trim SPACES only (Spark ltrim/rtrim).
  *  - alpha-word = token contains any of 'a'..'z' (lowercased input,
  *    the `rlike "[a-z]"` test).
  *  - stop_hits counts DISTINCT tokens among the 8 Gopher stopwords.
  *
  * Returns a struct; the boolean gates stay cheap codegen'd
  * comparisons on the caller side so thresholds remain configurable.
  */
case class GopherMetrics(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = GopherMetrics.schema
  override def prettyName: String = "gopher_metrics"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gopher_metrics requires string, got ${other.simpleString}")
    }

  private val whitespace = UTF8String.fromString("\\s+")
  private val newline = UTF8String.fromString("\n")

  /** Non-overlapping left-to-right occurrence count. */
  private def occurrences(hay: String, needle: String): Int = {
    var c = 0
    var i = hay.indexOf(needle)
    while (i >= 0) { c += 1; i = hay.indexOf(needle, i + needle.length) }
    c
  }

  private def codePoints(s: UTF8String): Int = s.numChars()

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String]
    val trimmed = raw.trim() // spaces only, like Spark trim()
    val toks: Array[UTF8String] =
      if (trimmed.numBytes == 0) Array.empty
      else trimmed.toLowerCase.split(whitespace, -1)
    val nWords = toks.length

    var lenSum = 0L
    var alphaWords = 0
    val seen = new java.util.HashSet[UTF8String]()
    var stopHits = 0
    var i = 0
    while (i < nWords) {
      val w = toks(i)
      lenSum += codePoints(w)
      // contains any a-z byte (tokens are lowercased; multi-byte
      // UTF-8 continuation bytes are >= 0x80, never in 'a'..'z')
      var hasAlpha = false
      var b = 0
      while (b < w.numBytes && !hasAlpha) {
        val ch = w.getByte(b)
        if (ch >= 'a' && ch <= 'z') hasAlpha = true
        b += 1
      }
      if (hasAlpha) alphaWords += 1
      if (GopherMetrics.stopSet.contains(w) && seen.add(w)) stopHits += 1
      i += 1
    }
    val meanLen = if (nWords == 0) 0.0 else lenSum.toDouble / nWords

    val rawStr = raw.toString
    val symbols = (occurrences(rawStr, "#") + occurrences(rawStr, "...") +
      occurrences(rawStr, "…")).toDouble

    val lines = raw.split(newline, -1)
    val nLines = lines.length
    var bullets = 0
    var ellipsis = 0
    val distinctLines = new java.util.HashSet[UTF8String]()
    var j = 0
    while (j < nLines) {
      val line = lines(j)
      val lt = line.trimLeft()
      if (lt.numBytes > 0) {
        val b0 = lt.getByte(0)
        // '•' is multi-byte (E2 80 A2): compare by prefix string
        if (b0 == '-' || b0 == '*' ||
            lt.startsWith(GopherMetrics.bullet)) bullets += 1
      }
      val rt = line.trimRight()
      if (rt.endsWith(GopherMetrics.dots3) ||
          rt.endsWith(GopherMetrics.hellip)) ellipsis += 1
      distinctLines.add(line)
      j += 1
    }
    val dupLineFrac =
      if (nLines == 0) 0.0
      else 1.0 - distinctLines.size.toDouble / nLines

    val out = new GenericInternalRow(9)
    out.setLong(0, nWords.toLong)
    out.setDouble(1, meanLen)
    out.setDouble(2, symbols)
    out.setDouble(3, bullets.toDouble)
    out.setDouble(4, ellipsis.toDouble)
    out.setDouble(5, alphaWords.toDouble)
    out.setInt(6, stopHits)
    out.setDouble(7, dupLineFrac)
    out.setDouble(8, nLines.toDouble)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): GopherMetrics =
    copy(child = newChild)
}

object GopherMetrics {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbols", DoubleType, nullable = false),
    StructField("bullet_lines", DoubleType, nullable = false),
    StructField("ellipsis_lines", DoubleType, nullable = false),
    StructField("alpha_words", DoubleType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("n_lines", DoubleType, nullable = false)))

  private[expressions] val stopSet: java.util.Set[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.ops.Text.gopherStopwords.foreach(w =>
      s.add(UTF8String.fromString(w)))
    s
  }

  private[expressions] val bullet = UTF8String.fromString("•")
  private[expressions] val dots3 = UTF8String.fromString("...")
  private[expressions] val hellip = UTF8String.fromString("…")

  def gopher_metrics(text: Column): Column =
    ColumnShim.column(GopherMetrics(ColumnShim.expression(text)))
}
