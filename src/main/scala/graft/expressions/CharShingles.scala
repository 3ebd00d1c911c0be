package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character k-shingles of a string as array<string> — one
  * tight loop per row instead of the interpreted
  * `array_distinct(transform(sequence(...), substr))` composition
  * (which pays per-element lambda overhead and O(n²) distinct;
  * measured ~5 s for 500 docs at sf0.01, ~0.1 s here).
  *
  * Char-indexed windows (UTF8String.substring), so results match a
  * SQL `substr` oracle on any input. Strings shorter than k yield the
  * whole string as the single shingle, mirroring the SQL branch.
  */
case class CharShingles(child: Expression, shingleK: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_shingles requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < shingleK) out.add(s)
    else {
      var i = 0
      while (i <= n - shingleK) {
        out.add(s.substring(i, i + shingleK))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def char_shingles(normalizedText: Column, k: Int): Column =
    ColumnShim.column(CharShingles(ColumnShim.expression(normalizedText), k))
}
