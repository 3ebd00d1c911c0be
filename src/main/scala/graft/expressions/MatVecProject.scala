package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Centered matrix–vector projection: `basis · (v − mean)` — the PCA
  * / whitening application kernel. The trained k×d basis and d-mean
  * ride inside the expression node (k=64, d=64 → 33 KB serialized
  * with the plan), and evaluation is one primitive flop loop per row.
  *
  * Why not compose from built-ins: the literal-tree alternative
  * (k×d `element_at`×`lit` terms) generates a d×k-node expression
  * tree — 4096 nodes at d=k=64 ballooned the task binary to 7 MB and
  * codegen compile to seconds, and at a realistic d=768 Janino would
  * not compile it at all. A single eval loop is O(k·d) flops with
  * zero per-row allocation beyond the output array, the same shape
  * [[NearestCentroids]] uses for the IVF probe.
  *
  * Accepts `array<float>` or `array<double>` input; accumulates in
  * double in ascending-index order (matches the oracle's fold order).
  */
case class MatVecProject(child: Expression,
                         basis: Array[Array[Double]],
                         mean: Array[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_project"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"mat_vec_project requires array<float|double>, got ${other.simpleString}")
    }

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v =
      if (isFloat) {
        val f = arr.toFloatArray()
        val d = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
        d
      } else arr.toDoubleArray()
    val d = mean.length
    require(v.length == d,
      s"embedding length ${v.length} != trained dimension $d")
    val centered = new Array[Double](d)
    var i = 0
    while (i < d) { centered(i) = v(i) - mean(i); i += 1 }
    val k = basis.length
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val row = basis(c)
      var s = 0.0
      var j = 0
      while (j < d) { s += centered(j) * row(j); j += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecProject =
    copy(child = newChild)
}

object MatVecProject {
  def mat_vec_project(vec: Column, basis: Array[Array[Double]],
                      mean: Array[Double]): Column =
    ColumnShim.column(MatVecProject(
      ColumnShim.expression(vec), basis, mean))
}
