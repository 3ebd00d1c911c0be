package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-coverage of the dominant word n-gram — the Gopher /
  * MassiveText repetition family's "top n-gram fraction" signal
  * (Rae et al. 2021, table A1: a doc where one 2-gram covers > 20%
  * of the characters is repetitious).
  *
  * Deterministic definition (ties need no arbitrary "first" pick):
  *
  *   coverage = max over n-grams of count(g) · chars(g) / total_chars
  *
  * where tokens are whitespace-split of the lowercased/trimmed text,
  * chars(g) = codepoints of the space-joined gram, and total_chars =
  * codepoints of the space-joined token list (so the metric is
  * whitespace-normalization-invariant). Fewer than n tokens, or
  * blank/empty text → 0.0. Codepoint counts match any engine whose
  * `length()` is codepoint-based (DuckDB, Polars), NOT UTF-16 units.
  *
  * One per-row pass (tokenize, hash-count the grams, one max scan) —
  * no shuffle, the same kernel tier as [[MinHashSignature64]].
  */
case class TopNgramCoverage(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"top_ngram_coverage: n must be >= 1, got $n")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "top_ngram_coverage"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_ngram_coverage requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val trimmed = text.trim.toLowerCase
    if (trimmed.isEmpty) return 0.0
    val toks = trimmed.split("\\s+")
    if (toks.length < n) return 0.0
    def cps(s: String): Int = s.codePointCount(0, s.length)
    val tokCps = toks.map(cps)
    // total = codepoints of single-space-joined tokens
    val total = tokCps.sum + (toks.length - 1)
    if (total == 0) return 0.0
    val counts = new java.util.HashMap[String, Int]()
    val gramCps = new java.util.HashMap[String, Int]()
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var c = tokCps(i)
      var j = 1
      while (j < n) {
        sb.append(' ').append(toks(i + j))
        c += 1 + tokCps(i + j)
        j += 1
      }
      val g = sb.toString
      counts.merge(g, 1, Integer.sum)
      gramCps.putIfAbsent(g, c)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cover = e.getValue.toLong * gramCps.get(e.getKey)
      if (cover > best) best = cover
    }
    best.toDouble / total
  }

  override protected def withNewChildInternal(newChild: Expression): TopNgramCoverage =
    copy(child = newChild)
}

object TopNgramCoverage {
  def top_ngram_coverage(text: Column, n: Int): Column =
    ColumnShim.column(TopNgramCoverage(ColumnShim.expression(text), n))
}
