package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's character distribution,
  * one primitive pass per row — a cheap garbage detector for corpus
  * quality scoring: keyboard mash, repeated-char padding and
  * base64/hex blobs sit far from natural-language entropy (~3.5–4.5
  * bits for English), so a band filter on this column drops both the
  * degenerate low end and the random-noise high end.
  *
  * Counts UTF-16 code units against a per-task frequency table
  * (65,536 ints, reused across rows, reset via a touched-list — no
  * per-row allocation beyond the string decode). Summation iterates
  * code units ascending, so the result is deterministic across
  * partitionings. NULL → NULL; empty string → 0.0 (a zero-length
  * message carries no information).
  *
  * The HOF spelling would explode chars → groupBy — a shuffle of
  * O(total chars) rows; this is a projection. The DuckDB oracle DOES
  * pay that explode (it has no such kernel), which is fine at oracle
  * scale; both sides agree under fixed-point rounding (`r(x, 4)`).
  */
case class CharEntropy(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy requires string, got ${other.simpleString}")
    }

  @transient private lazy val freq = new Array[Int](1 << 16)
  @transient private lazy val touched = new Array[Char](1 << 16)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n == 0) return 0.0
    var nTouched = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (freq(c) == 0) { touched(nTouched) = c; nTouched += 1 }
      freq(c) += 1
      i += 1
    }
    // ascending code-unit order → deterministic FP summation
    java.util.Arrays.sort(touched, 0, nTouched)
    val ln2 = math.log(2.0)
    var h = 0.0
    var t = 0
    while (t < nTouched) {
      val p = freq(touched(t)).toDouble / n
      h -= p * (math.log(p) / ln2)
      freq(touched(t)) = 0 // reset for the next row
      t += 1
    }
    h
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

object CharEntropy {
  def char_entropy(text: Column): Column =
    ColumnShim.column(CharEntropy(ColumnShim.expression(text)))
}
