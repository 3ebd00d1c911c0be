package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of k pre-bucketed dimensions.
  *
  * Input: an array<int> of k bucket indices, each in [0, 2^bits); bit
  * i of dimension c lands at output bit `i*k + c`, so the code orders
  * rows along the Z-space-filling curve over the k dimensions. Rows
  * sorted by this code place multi-column "nearby" values in the same
  * parquet row groups, which is what makes min/max skipping effective
  * for predicates on ANY of the clustered columns — single-column sort
  * only helps the leading column (the motivation for cluster_by in
  * lakehouse writers; see [[graft.ops.ZOrder]] for the bucketing and
  * write path).
  *
  * Null array → null; a null ELEMENT contributes bucket 0 (clustering
  * is a layout choice, not a semantic one — dropping the row or
  * nulling the code would change write contents or ordering
  * stability). Out-of-range buckets are masked to `bits` bits rather
  * than corrupting neighbors' lanes. k*bits must fit a signed long
  * (≤ 63).
  */
case class ZOrderCode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_code"

  private def bitsOf(e: Expression): Option[Int] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        bitsOf(right) match {
          case Some(b) if b >= 1 && b <= 21 => TypeCheckResult.TypeCheckSuccess
          case Some(b) => TypeCheckResult.TypeCheckFailure(
            s"zorder_code bits must be in [1, 21], got $b")
          case None => TypeCheckResult.TypeCheckFailure(
            "zorder_code bits must be an integer literal")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_code requires (array<int>, int literal), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(dims: Any, bitsAny: Any): Any = {
    val a = dims.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val k = a.numElements()
    if (k == 0) return 0L
    require(k.toLong * bits <= 63,
      s"zorder_code: $k dims x $bits bits exceeds 63 output bits")
    val mask = (1 << bits) - 1
    var code = 0L
    var c = 0
    while (c < k) {
      val v = (if (a.isNullAt(c)) 0 else a.getInt(c)) & mask
      var i = 0
      while (i < bits) {
        code |= ((v >> i) & 1L) << (i * k + c)
        i += 1
      }
      c += 1
    }
    code
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderCode =
    copy(left = newLeft, right = newRight)
}

object ZOrderCode {
  def zorder_code(dims: Column, bits: Int): Column =
    ColumnShim.column(ZOrderCode(ColumnShim.expression(dims),
      org.apache.spark.sql.catalyst.expressions.Literal(bits)))
}

/** Equi-depth bucket index of a double against SORTED boundaries:
  * the count of boundaries ≤ value (binary search, O(log n) primitive
  * steps). Boundaries come from a one-pass `approxQuantile` over the
  * frame (see [[graft.ops.ZOrder]]) and ride along as an array
  * literal, so the bucketing itself is shuffle-free and
  * sampling-error-tolerant — a boundary that's slightly off moves a
  * few rows one bucket over, it does not break the layout.
  *
  * The HOF spelling `aggregate(B, 0, (acc, b) -> acc + int(v >= b))`
  * evaluates a per-element Catalyst subtree 2^bits times per row; this
  * is the same interpreted-kernel hazard the sim/dedup family already
  * eliminated ([[VectorKernels]]), hence an expression.
  */
case class SortedBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_bucket"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_bucket requires (double, array<double>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(v: Any, bs: Any): Any = {
    val x = v.asInstanceOf[Double]
    val b = bs.asInstanceOf[ArrayData]
    var lo = 0
    var hi = b.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.getDouble(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedBucket =
    copy(left = newLeft, right = newRight)
}

object SortedBucket {
  def sorted_bucket(v: Column, boundaries: Column): Column =
    ColumnShim.column(SortedBucket(
      ColumnShim.expression(v), ColumnShim.expression(boundaries)))
}

/** Hilbert-curve index of TWO pre-bucketed dimensions — the
  * better-locality sibling of [[ZOrderCode]] (Delta/Iceberg expose
  * both for OPTIMIZE). Unlike the Z curve, consecutive Hilbert codes
  * are always grid-adjacent (no Morton "jumps" across the space), so
  * a range of codes maps to a tighter spatial region and parquet
  * min/max skipping prunes more files for 2-column range predicates.
  *
  * Algorithm, 2 dims: the classic iterative xy2d walk (quadrant
  * bit → reflect/rotate, public domain — the `s-1` reflection
  * variant, so each step is self-contained in `s`), top bit down;
  * code in [0, 4^bits). This is the path `q_hilbert`'s recursive-CTE
  * oracle replays exactly.
  *
  * Algorithm, k ≥ 3 dims: Skilling's transpose transform
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 —
  * public domain): inverse-undo + Gray decode over the coordinate
  * array, then MSB-first bit interleave of the transposed axes. The
  * two paths produce different (both valid) Hilbert orders, so k = 2
  * stays on the oracled walk; HilbertSpec certifies BOTH by the
  * defining properties (bijection + unit-step grid adjacency,
  * exhaustive on small grids).
  *
  * Same null contract as [[ZOrderCode]]: null array → null, null
  * ELEMENT → bucket 0, out-of-range buckets masked to `bits` bits;
  * k·bits ≤ 63.
  */
case class HilbertCode(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_code"

  private def bitsOf(e: Expression): Option[Int] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => Some(v)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        bitsOf(right) match {
          case Some(b) if b >= 1 && b <= 31 => TypeCheckResult.TypeCheckSuccess
          case Some(b) => TypeCheckResult.TypeCheckFailure(
            s"hilbert_code bits must be in [1, 31], got $b")
          case None => TypeCheckResult.TypeCheckFailure(
            "hilbert_code bits must be an integer literal")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_code requires (array<int>, int literal), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(dims: Any, bitsAny: Any): Any = {
    val a = dims.asInstanceOf[ArrayData]
    val bits = bitsAny.asInstanceOf[Int]
    val k = a.numElements()
    require(k >= 2, s"hilbert_code requires >= 2 dims, got $k")
    require(k.toLong * bits <= 63,
      s"hilbert_code: $k dims x $bits bits exceeds 63 output bits")
    val mask = if (bits == 31) Int.MaxValue else (1 << bits) - 1
    if (k == 2) {
      var x = (if (a.isNullAt(0)) 0 else a.getInt(0)) & mask
      var y = (if (a.isNullAt(1)) 0 else a.getInt(1)) & mask
      var d = 0L
      var s = 1 << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1 else 0
        val ry = if ((y & s) > 0) 1 else 0
        d += s.toLong * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    } else {
      // Skilling AxesToTranspose, then MSB-first interleave
      val x = new Array[Int](k)
      var i = 0
      while (i < k) {
        x(i) = (if (a.isNullAt(i)) 0 else a.getInt(i)) & mask
        i += 1
      }
      var q = 1 << (bits - 1)
      while (q > 1) {
        val p = q - 1
        i = 0
        while (i < k) {
          if ((x(i) & q) != 0) x(0) ^= p
          else {
            val t = (x(0) ^ x(i)) & p
            x(0) ^= t; x(i) ^= t
          }
          i += 1
        }
        q >>= 1
      }
      i = 1
      while (i < k) { x(i) ^= x(i - 1); i += 1 }
      var t = 0
      q = 1 << (bits - 1)
      while (q > 1) {
        if ((x(k - 1) & q) != 0) t ^= q - 1
        q >>= 1
      }
      i = 0
      while (i < k) { x(i) ^= t; i += 1 }
      var d = 0L
      var bit = bits - 1
      while (bit >= 0) {
        i = 0
        while (i < k) {
          d = (d << 1) | ((x(i) >> bit) & 1L)
          i += 1
        }
        bit -= 1
      }
      d
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertCode =
    copy(left = newLeft, right = newRight)
}

object HilbertCode {
  def hilbert_code(dims: Column, bits: Int): Column =
    ColumnShim.column(HilbertCode(ColumnShim.expression(dims),
      org.apache.spark.sql.catalyst.expressions.Literal(bits)))
}
