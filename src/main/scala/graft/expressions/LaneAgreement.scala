package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Fraction of positions where two equal-length array<long> columns
  * agree — the MinHash signature-agreement Jaccard estimator
  * (P[minhash_i(A) == minhash_i(B)] = J(A,B), Broder 1997). One
  * primitive loop per candidate pair instead of interpreted
  * zip_with + filter + size (which allocates a boolean array and
  * boxes every lane). Whole-stage codegen (round 15, guide §4): this
  * runs once per candidate PAIR — pair streams outnumber docs on any
  * near-dup-dense corpus — and the CodegenFallback dispatch cost per
  * call dominated the 64-lane compare. */
case class LaneAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "lane_agreement"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lane_agreement requires (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var same = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) same += 1
      i += 1
    }
    same.toDouble / n.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val same = ctx.freshName("same")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |if ($n == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  int $same = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getLong($i) == $b.getLong($i)) $same++;
         |  }
         |  ${ev.value} = (double) $same / (double) $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LaneAgreement =
    copy(left = newLeft, right = newRight)
}

object LaneAgreement {
  def lane_agreement(a: Column, b: Column): Column =
    ColumnShim.column(LaneAgreement(
      ColumnShim.expression(a), ColumnShim.expression(b)))
}
