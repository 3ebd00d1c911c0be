package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Indices of the `n` nearest centroids (L2) for a double vector —
  * the IVF assignment/probe kernel. The centroid matrix is part of
  * the expression node (broadcast with the serialized plan, tiny:
  * nlist × dim doubles); evaluation is one primitive flop loop
  * instead of nlist interpreted aggregate(zip_with) subtrees + an
  * array_sort of structs (which cost ~13 s for 2000 rows at sf0.1).
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids requires array<double>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ctr = centroids(c)
      var s = 0.0
      var i = 0
      val dim = math.min(v.length, ctr.length)
      while (i < dim) { val d = v(i) - ctr(i); s += d * d; i += 1 }
      dists(c) = s
      c += 1
    }
    val take = math.min(n, k)
    val out = new Array[Any](take)
    val used = new Array[Boolean](k)
    var j = 0
    while (j < take) {
      var best = -1
      var bestD = Double.MaxValue
      var cc = 0
      while (cc < k) {
        if (!used(cc) && dists(cc) < bestD) { bestD = dists(cc); best = cc }
        cc += 1
      }
      used(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroids {
  def nearest_centroids(vec: Column, centroids: Array[Array[Double]],
                        n: Int): Column =
    ColumnShim.column(NearestCentroids(
      ColumnShim.expression(vec), centroids, n))
}
