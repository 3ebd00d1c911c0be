package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature (Charikar 2002) as one primitive
  * loop per row — the hot kernel of `dedup_embedding_lsh` and
  * `sim_topk_lsh`.
  *
  * Bit p of the result is set iff the projection of the vector onto
  * pseudo-random plane p is >= 0, where plane p's component for
  * dimension i is the symmetric {-1, +1} weight derived from
  * xxhash64(p, i) mod 2 — bit-for-bit the same signature the previous
  * interpreted HOF formulation produced
  * (`when(pmod(xxhash64(lit(p), i), 2) === 0, 1.0).otherwise(-1.0)`,
  * summed left-to-right), but evaluated as planes × dim primitive
  * flops with a per-task cached weight table instead of planes
  * interpreted aggregate(zip_with(transform(sequence))) subtrees that
  * re-hash every (p, i) pair per row.
  *
  * Deterministic and matrix-free: the weights derive from the same
  * seed-42 xxhash64 chain Spark's `xxhash64(p, i)` evaluates, so every
  * executor (and any external reimplementation) agrees on the planes
  * without shipping state beyond this node's two ints.
  */
case class HyperplaneSignature64(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], got $planes")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_signature64 requires array<double>, got ${other.simpleString}")
    }

  // The HOF reference form never yields NULL: a NULL vector, an empty
  // array, or a null element all poison the projection, so every
  // `when(proj >= 0, bit)` takes the `otherwise(0)` branch → 0L.
  override def nullable: Boolean = false

  // Weight table cache, grown to the largest dimensionality seen on
  // this task. planes × dim doubles (e.g. 16 × 1024 = 128 KiB) — tiny,
  // rebuilt at most log-ish times if dims vary, usually once.
  // Published as ONE (dim, table) reference so a concurrent reader can
  // never pair a new dim with a stale smaller table.
  @transient private var cache: (Int, Array[Array[Double]]) = _

  private def tableFor(dim: Int): Array[Array[Double]] = {
    val c = cache
    if (c != null && dim <= c._1) return c._2
    val t = Array.ofDim[Double](planes, dim)
    var p = 0
    while (p < planes) {
      // xxhash64(p, i) == hashInt(i, hashInt(p, seed=42)) — Spark
      // folds the hash left-to-right over the argument list.
      val hp = XXH64.hashInt(p, 42L)
      val row = t(p)
      var i = 0
      while (i < dim) {
        val h = XXH64.hashInt(i, hp)
        // pmod(h, 2) == 0 → +1 else -1
        row(i) = if ((h & 1L) == 0L) 1.0 else -1.0
        i += 1
      }
      p += 1
    }
    cache = (dim, t)
    t
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return 0L // HOF parity: NULL vector → 0L
    val arr = value.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (dim == 0) return 0L // HOF parity: empty → null-poisoned proj → 0L
    var i = 0
    while (i < dim) { // HOF parity: null element poisons every plane
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    val v = arr.toDoubleArray()
    val table = tableFor(dim)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val w = table(p)
      var s = 0.0
      var j = 0
      while (j < dim) { s += v(j) * w(j); j += 1 }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature64 =
    copy(child = newChild)
}

object HyperplaneSignature64 {
  def hyperplane_signature64(vec: Column, planes: Int): Column =
    ColumnShim.column(HyperplaneSignature64(ColumnShim.expression(vec), planes))
}
