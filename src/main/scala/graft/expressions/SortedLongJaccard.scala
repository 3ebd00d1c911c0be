package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Exact Jaccard similarity of two SORTED array<long> columns via a
  * single merge pass: |A∩B| / (|A|+|B|-|A∩B|).
  *
  * Used for n-gram set similarity after shingles are hashed to longs
  * (equality-preserving, 64-bit collisions negligible) and sorted once
  * per document. The built-in `array_intersect`/`array_union` pair
  * builds two hash sets per candidate pair in interpreted mode; this
  * is one O(|A|+|B|) primitive-long merge — the difference between
  * the verify stage dominating an LSH dedup pipeline and it being
  * noise. Inputs MUST be sorted ascending and deduplicated (CharShingles
  * output hashed via xxhash64 then array_sort satisfies both).
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_long_jaccard"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_long_jaccard requires (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  // whole-stage codegen (round 15, guide §4): the verify merge runs
  // once per candidate pair — the hot stream of every shingle-LSH
  // dedup pipeline
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { $inter++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
         |final int $union = $na + $nb - $inter;
         |${ev.value} = ($union == 0) ? 0.0 : (double) $inter / (double) $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccard {
  def sorted_long_jaccard(a: Column, b: Column): Column =
    ColumnShim.column(SortedLongJaccard(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
