package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Product-quantization kernels — the FAISS IVF-PQ shape for ANN at
  * 100 TB, where the candidate scan must not carry full vectors.
  *
  * A D-dim vector is split into M contiguous subvectors of D/M dims;
  * each subvector is quantized to the index of its nearest centroid
  * in a per-subspace codebook of `ksub ≤ 256` entries. The corpus
  * side then stores **M bytes per vector** instead of 8·D — a 64×
  * compression at D=64/M=8 — and scoring a candidate against a query
  * is M table lookups + adds (asymmetric distance computation, ADC):
  * the query precomputes `table[m·ksub + c] = dot(q_m, codebook[m][c])`
  * ONCE, so the per-candidate cost never touches the query vector.
  *
  * Codebook matrices ride on the expression nodes (tiny:
  * M·ksub·(D/M) doubles) and are broadcast with the serialized plan,
  * the same pattern as [[NearestCentroids]].
  */
object ProductQuantizer {

  private def checkVec(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double>, got ${other.simpleString}")
    }

  /** Encode an array<double> into M code bytes (one per subspace,
    * nearest sub-centroid by L2). Null input or null element → null;
    * a vector whose length ≠ M · dsub → null (length mismatch, same
    * contract as [[VectorKernels.DotProductDouble]]). */
  case class PqEncode(child: Expression,
                      codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = BinaryType
    override def prettyName: String = "pq_encode"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = codebooks.length
      val dsub = codebooks(0)(0).length
      if (v.numElements() != m * dsub) return null
      var i = 0
      while (i < v.numElements()) {
        if (v.isNullAt(i)) return null
        i += 1
      }
      val out = new Array[Byte](m)
      var sub = 0
      while (sub < m) {
        val cb = codebooks(sub)
        val off = sub * dsub
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          val ctr = cb(c)
          var s = 0.0
          var d = 0
          while (d < dsub) {
            val diff = v.getDouble(off + d) - ctr(d)
            s += diff * diff
            d += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        out(sub) = best.toByte
        sub += 1
      }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** ADC lookup table for a query vector: flattened M·ksub doubles,
    * `table[m·ksub + c] = dot(q_m, codebook[m][c])` (inner-product
    * metric — on L2-normalized inputs the summed lookups approximate
    * cosine). Null input/element or length mismatch → null. */
  case class PqAdcTable(child: Expression,
                        codebooks: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_adc_table"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      checkVec(child.dataType, prettyName)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val m = codebooks.length
      val ksub = codebooks(0).length
      val dsub = codebooks(0)(0).length
      if (v.numElements() != m * dsub) return null
      var i = 0
      while (i < v.numElements()) {
        if (v.isNullAt(i)) return null
        i += 1
      }
      val out = new Array[Any](m * ksub)
      var sub = 0
      while (sub < m) {
        val cb = codebooks(sub)
        val off = sub * dsub
        var c = 0
        while (c < ksub) {
          val ctr = cb(c)
          var s = 0.0
          var d = 0
          while (d < dsub) { s += v.getDouble(off + d) * ctr(d); d += 1 }
          out(sub * ksub + c) = s
          c += 1
        }
        sub += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
      copy(child = newChild)
  }

  /** ADC score: Σ_m table[m·ksub + code_m] — the per-candidate hot
    * loop, M lookups + adds, no multiplies, no query vector. ksub is
    * inferred as table.length / code.length; an inconsistent pair
    * (table not divisible, code byte ≥ ksub) → null. */
  case class PqAdcScore(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc_score"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"pq_adc_score requires (binary, array<double>), " +
            s"got (${l.simpleString}, ${r.simpleString})")
      }

    override def nullSafeEval(codeAny: Any, tableAny: Any): Any = {
      val code = codeAny.asInstanceOf[Array[Byte]]
      val table = tableAny.asInstanceOf[ArrayData]
      val m = code.length
      if (m == 0 || table.numElements() % m != 0) return null
      val ksub = table.numElements() / m
      var s = 0.0
      var sub = 0
      while (sub < m) {
        val c = code(sub) & 0xff
        if (c >= ksub) return null
        if (table.isNullAt(sub * ksub + c)) return null
        s += table.getDouble(sub * ksub + c)
        sub += 1
      }
      s
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcScore =
      copy(left = newLeft, right = newRight)
  }

  def pq_encode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(vec), codebooks))

  def pq_adc_table(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqAdcTable(ColumnShim.expression(vec), codebooks))

  def pq_adc_score(code: Column, table: Column): Column =
    ColumnShim.column(PqAdcScore(
      ColumnShim.expression(code), ColumnShim.expression(table)))
}
