package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization of a (normalized, space-separated) string against
  * a learned merge table: each word starts as its codepoint symbols,
  * then — repeatedly — the LOWEST-RANK merge pair present anywhere in
  * the word is applied at its LEFTMOST occurrence, until no pair from
  * the table is adjacent (the byte-pair-encoding of Sennrich et al.
  * 2016, with the one-occurrence-per-step application order the
  * reference tokenizer implementations use). Output is the flat token
  * sequence across words, order-preserving.
  *
  * The merge table rides as a broadcast handle (same pattern as
  * [[VocabEncode]]) — learned vocabularies reach 10k–100k merges, too
  * big for a plan literal. Per row the work is O(word² · 1) hash
  * lookups worst case (each step is one adjacency scan against the
  * rank map and words are short), a shuffle-free projection.
  *
  * NULL string → NULL. Empty/blank string → empty array. Determinism:
  * ranks are the training order; ties cannot arise (ranks unique, and
  * the leftmost-occurrence rule breaks positional ties).
  */
case class BpeEncode(child: Expression,
                     merges: Broadcast[Array[Array[String]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires string, got ${other.simpleString}")
    }

  // (a, b) -> rank; first occurrence wins if the table ever repeats a pair
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val arr = merges.value
    var i = 0
    while (i < arr.length) {
      m.putIfAbsent(arr(i)(0) + "" + arr(i)(1), i)
      i += 1
    }
    m
  }

  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    // codepoint symbols (DuckDB's substr counts codepoints — the
    // oracle walks the same units)
    val cps = word.codePoints().toArray
    val syms = scala.collection.mutable.ArrayBuffer.tabulate(cps.length)(i =>
      new String(Character.toChars(cps(i))))
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.get(syms(i) + "" + syms(i + 1))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms(bestIdx) = syms(bestIdx) + syms(bestIdx + 1)
        syms.remove(bestIdx + 1)
        if (syms.length < 2) done = true
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    while (i <= text.length) {
      if (i == text.length || text.charAt(i) == ' ') {
        if (i > start) encodeWord(text.substring(start, i), out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def bpe_encode(normalizedText: Column,
                 merges: Broadcast[Array[Array[String]]]): Column =
    ColumnShim.column(BpeEncode(ColumnShim.expression(normalizedText), merges))
}
