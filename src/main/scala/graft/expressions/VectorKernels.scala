package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Primitive-loop vector kernels for the similarity/dedup family.
  *
  * These replace the interpreted higher-order-function formulations
  * (`aggregate(zip_with(...))` for dot, staged
  * `transform(v, x => x / n)` for normalize) that were evaluated as
  * per-element Catalyst subtrees — the same class of hot-kernel fix as
  * [[HyperplaneSignature64]] and [[NearestCentroids]]. Semantics are
  * pinned to the HOF reference forms (kept in `Similarity` for parity
  * tests): left-to-right summation (bit-identical floats), null
  * element or length mismatch → null result, zero vector normalizes
  * to itself.
  */
object VectorKernels {

  /** dot(a, b) over two array<double>, summed left-to-right.
    * Null if: either input null, lengths differ (zip_with pads with
    * null → null sum), or any element is null. */
  case class DotProductDouble(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product_double"

    // The result can be null regardless of child nullability (length
    // mismatch, null element) — without this the optimizer would fold
    // IsNull(dot) to false over non-nullable array inputs.
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"dot_product_double requires (array<double>, array<double>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    // whole-stage codegen (round 15, guide §4): dot runs per
    // candidate/verify PAIR (the embedding near-dup verify stream and
    // the exact re-rank) — identical left-to-right accumulation, so
    // results stay bit-identical to the interpreted path
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = $s;
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductDouble =
      copy(left = newLeft, right = newRight)
  }

  /** L2-normalize an array<double>: v / sqrt(dot(v, v)), left-to-right
    * norm accumulation. Zero vectors pass through unchanged (cosine 0
    * against everything, not NaN). A null element poisons the norm —
    * every output element becomes null (array length preserved),
    * matching `when(n === 0, v).otherwise(transform(v, _ / null))`. */
  case class L2NormalizeDouble(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def prettyName: String = "l2_normalize_double"

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"l2_normalize_double requires array<double>, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var i = 0
      var hasNull = false
      var s = 0.0
      while (i < n && !hasNull) {
        if (v.isNullAt(i)) hasNull = true
        else { val x = v.getDouble(i); s += x * x }
        i += 1
      }
      if (hasNull) return new GenericArrayData(new Array[Any](n))
      val norm = math.sqrt(s)
      val out = new Array[Any](n)
      if (norm == 0.0) {
        var j = 0
        while (j < n) { out(j) = v.getDouble(j); j += 1 }
      } else {
        var j = 0
        while (j < n) { out(j) = v.getDouble(j) / norm; j += 1 }
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): L2NormalizeDouble =
      copy(child = newChild)
  }

  def dot_product_double(a: Column, b: Column): Column =
    ColumnShim.column(DotProductDouble(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  def l2_normalize_double(v: Column): Column =
    ColumnShim.column(L2NormalizeDouble(ColumnShim.expression(v)))
}
