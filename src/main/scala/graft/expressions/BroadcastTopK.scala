package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Exact top-`k` cosine neighbors of a row's vector against a
  * BROADCAST id+matrix pair riding inside the expression node — the
  * self-kNN kernel. Children: `(row id: long, L2-normalized vector:
  * array<double>)`; result: `array<struct<neighbor_id: long,
  * cosine: double>>` ordered best-first, the row's own id excluded.
  *
  * Why not the join spelling: `corpus ⋈ broadcast(corpus)` with a
  * per-query rank window materializes n² candidate ROWS (each
  * re-extracting both vectors from ArrayData — 3.2 GB of transient
  * arrays at n=5000, d=64) just so the window can throw almost all
  * of them away. Here each corpus row makes ONE pass over the
  * broadcast matrix (primitive flop loop, no per-candidate
  * allocation) and emits exactly k entries; there is no join and no
  * window in the plan at all. Ordering is (cosine desc, id asc) —
  * identical to the window spelling, bit-for-bit, since both
  * evaluate the same in-order double dot products.
  *
  * The matrix is the expression's payload (n×d doubles — bounded by
  * the same "queries must broadcast" contract the join spelling
  * already has; ~2.5 MB at n=5000, d=64, serialized once with the
  * plan, not per task).
  */
case class BroadcastTopK(left: Expression, right: Expression,
                         ids: Array[Long], mat: Array[Array[Double]],
                         k: Int)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "broadcast_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"broadcast_topk requires (bigint, array<double>), got $other")
    }

  override def nullSafeEval(idAny: Any, vecAny: Any): Any = {
    val selfId = idAny.asInstanceOf[Long]
    val v = vecAny.asInstanceOf[ArrayData].toDoubleArray()
    val n = ids.length
    val take = math.min(k, math.max(0, n - 1))
    // bounded insertion select: k is small (top-k), so an O(n·k)
    // insert beats heap constant factors and allocates nothing
    val bestIds = new Array[Long](take)
    val bestCos = new Array[Double](take)
    var filled = 0
    var j = 0
    while (j < n) {
      if (ids(j) != selfId) {
        val row = mat(j)
        var s = 0.0
        var i = 0
        val d = math.min(v.length, row.length)
        while (i < d) { s += v(i) * row(i); i += 1 }
        // find insertion point among the current best
        var pos = filled
        while (pos > 0 && (bestCos(pos - 1) < s ||
            (bestCos(pos - 1) == s && bestIds(pos - 1) > ids(j)))) {
          pos -= 1
        }
        if (pos < take) {
          val upto = math.min(filled, take - 1)
          var m = upto
          while (m > pos) {
            bestCos(m) = bestCos(m - 1); bestIds(m) = bestIds(m - 1)
            m -= 1
          }
          bestCos(pos) = s
          bestIds(pos) = ids(j)
          if (filled < take) filled += 1
        }
      }
      j += 1
    }
    val out = new Array[Any](filled)
    var r = 0
    while (r < filled) {
      out(r) = new GenericInternalRow(Array[Any](bestIds(r), bestCos(r)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BroadcastTopK =
    copy(left = newLeft, right = newRight)
}

object BroadcastTopK {
  def broadcast_topk(id: Column, vec: Column, ids: Array[Long],
                     mat: Array[Array[Double]], k: Int): Column =
    ColumnShim.column(BroadcastTopK(
      ColumnShim.expression(id), ColumnShim.expression(vec), ids, mat, k))
}
