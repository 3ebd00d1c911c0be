package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Int8-compressed candidate payloads for the LSH/IVF ANN scans: the
  * candidate join ships D CODE BYTES + two doubles per corpus vector
  * instead of 8·D vector bytes (8× smaller shuffle/broadcast-probe
  * payload at D=64), and the approximate score prunes candidates to a
  * small re-rank set that alone touches the full fp vectors.
  *
  * Quantization arithmetic is EXACTLY [[graft.ops.Similarity.quantizeInt8]]
  * (per-vector [min, max] range, engine-portable floor(x+0.5+1e-6)
  * rounding, degenerate constant vectors → -128) — the oracled
  * `sim_quantize_int8` pins every cell of that scheme, and these
  * kernels are its packed-binary twin.
  *
  * Whole-stage CODEGEN (round 15, guide §4 "eliminate non-codegen
  * expressions in the hot path"): these kernels run once per
  * CANDIDATE row — 88M rows at the ×10 self-graph, 1.8B at ×100 —
  * and as CodegenFallback each call paid interpreted-eval dispatch
  * and boxing inside an otherwise compiled stage (measured ~8 µs per
  * candidate on the ×10 IVF scan, ~50× the arithmetic). doGenCode
  * emits the identical loops (same accumulation order — the scores
  * stay bit-identical, which the oracle hash gates require); the
  * interpreted nullSafeEval is retained for constant folding and
  * non-codegen parents. */
object Int8Candidates {

  /** array<double> → struct(code: binary(D), mn: double, scale: double).
    * Null input or null element → null. */
  case class Int8Code(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = StructType(Seq(
      StructField("code", BinaryType, nullable = false),
      StructField("mn", DoubleType, nullable = false),
      StructField("scale", DoubleType, nullable = false)))
    override def prettyName: String = "int8_code"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"int8_code requires array<double>, got ${other.simpleString}")
      }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var i = 0
      var mn = Double.MaxValue
      var mx = Double.MinValue
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = v.getDouble(i)
        if (x < mn) mn = x
        if (x > mx) mx = x
        i += 1
      }
      if (n == 0) return InternalRow(Array.emptyByteArray, 0.0, 0.0)
      val s = (mx - mn) / 255.0
      val code = new Array[Byte](n)
      i = 0
      while (i < n) {
        code(i) =
          if (s == 0.0) (-128).toByte
          else (math.floor((v.getDouble(i) - mn) / s + 0.5 + 1e-6) - 128).toByte
        i += 1
      }
      InternalRow(code, mn, s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val mn = ctx.freshName("mn")
        val mx = ctx.freshName("mx")
        val x = ctx.freshName("x")
        val s = ctx.freshName("s")
        val code = ctx.freshName("code")
        val rowCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
        s"""
           |final int $n = $v.numElements();
           |double $mn = Double.MAX_VALUE;
           |double $mx = -Double.MAX_VALUE;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  final double $x = $v.getDouble($i);
           |  if ($x < $mn) $mn = $x;
           |  if ($x > $mx) $mx = $x;
           |}
           |if (!${ev.isNull}) {
           |  if ($n == 0) {
           |    ${ev.value} = new $rowCls(new Object[]{new byte[0], 0.0, 0.0});
           |  } else {
           |    final double $s = ($mx - $mn) / 255.0;
           |    final byte[] $code = new byte[$n];
           |    for (int $j = 0; $j < $n; $j++) {
           |      $code[$j] = ($s == 0.0) ? (byte) -128
           |        : (byte) (Math.floor(($v.getDouble($j) - $mn) / $s + 0.5 + 1e-6) - 128);
           |    }
           |    ${ev.value} = new $rowCls(new Object[]{$code, $mn, $s});
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Int8Code =
      copy(child = newChild)
  }

  /** Approximate dot(q, dequant(code)) = mn·Σq_i + scale·Σ q_i·(c_i+128)
    * — one loop over the code bytes, no dequantized array materialized.
    * Length mismatch or null element → null. */
  case class Int8Dot(first: Expression, second: Expression,
                     third: Expression, fourth: Expression)
      extends QuaternaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "int8_dot"
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
        case (ArrayType(DoubleType, _), BinaryType, DoubleType, DoubleType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"int8_dot requires (array<double>, binary, double, double), got $other")
      }

    override def nullSafeEval(qAny: Any, codeAny: Any, mnAny: Any,
                              scaleAny: Any): Any = {
      val q = qAny.asInstanceOf[ArrayData]
      val code = codeAny.asInstanceOf[Array[Byte]]
      val mn = mnAny.asInstanceOf[Double]
      val scale = scaleAny.asInstanceOf[Double]
      val n = code.length
      if (q.numElements() != n) return null
      var sumQ = 0.0
      var sumQC = 0.0
      var i = 0
      while (i < n) {
        if (q.isNullAt(i)) return null
        val qi = q.getDouble(i)
        sumQ += qi
        // stored + 128 = quantization level in [0, 255]; flipping the
        // sign bit of the unsigned byte view computes it exactly
        sumQC += qi * (((code(i) & 0xff) ^ 0x80).toDouble)
        i += 1
      }
      mn * sumQ + scale * sumQC
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (q, code, mn, scale) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val qi = ctx.freshName("qi")
        val sumQ = ctx.freshName("sumQ")
        val sumQC = ctx.freshName("sumQC")
        s"""
           |final int $n = $code.length;
           |if ($q.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $sumQ = 0.0;
           |  double $sumQC = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($q.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    final double $qi = $q.getDouble($i);
           |    $sumQ += $qi;
           |    $sumQC += $qi * (double) (($code[$i] & 0xff) ^ 0x80);
           |  }
           |  if (!${ev.isNull}) {
           |    ${ev.value} = $mn * $sumQ + $scale * $sumQC;
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression, newFourth: Expression): Int8Dot =
      copy(first = newFirst, second = newSecond,
        third = newThird, fourth = newFourth)
  }

  /** Approximate dot of TWO quantized vectors, given their
    * `int8_code` structs: with level l = (code & 0xff) ^ 0x80 and
    * value_i = mn + scale·l_i on each side,
    *
    *   dot(a, b) ≈ d·mnA·mnB + mnA·sB·Σ lB + mnB·sA·Σ lA
    *               + sA·sB·Σ lA_i·lB_i
    *
    * — one integer loop over the code bytes, NO float vector on
    * either side. This is what lets the LSH SELF-graph score its
    * candidates inside the bucket join: the probe rows carry 64 code
    * bytes instead of the 512-byte float vector, and the candidate
    * stream never re-shuffles to meet a query-vector table (the
    * query_id attach join shuffled the FULL candidate mass — ~100 GB
    * at the 1.6M-vector ×100 fixture). Both-side quantization is a
    * slightly coarser approximation than [[Int8Dot]]'s float×int8 —
    * only candidate SELECTION sees it (exact re-rank computes the
    * output cosines), and the recall gates pin the floor.
    * Length mismatch → null; null struct → null. */
  case class Int8DotInt8(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "int8_dot_int8"
    override def nullable: Boolean = true

    private def isCodeStruct(dt: DataType): Boolean = dt match {
      case StructType(Array(
        StructField(_, BinaryType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, DoubleType, _, _))) => true
      case _ => false
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (isCodeStruct(left.dataType) && isCodeStruct(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"int8_dot_int8 requires two int8_code structs, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

    override def nullSafeEval(aAny: Any, bAny: Any): Any = {
      val a = aAny.asInstanceOf[InternalRow]
      val b = bAny.asInstanceOf[InternalRow]
      val codeA = a.getBinary(0); val mnA = a.getDouble(1)
      val sA = a.getDouble(2)
      val codeB = b.getBinary(0); val mnB = b.getDouble(1)
      val sB = b.getDouble(2)
      val n = codeA.length
      if (codeB.length != n) return null
      var sumA = 0L; var sumB = 0L; var dotAB = 0L
      var i = 0
      while (i < n) {
        val la = (codeA(i) & 0xff) ^ 0x80
        val lb = (codeB(i) & 0xff) ^ 0x80
        sumA += la; sumB += lb; dotAB += la.toLong * lb
        i += 1
      }
      n * mnA * mnB + mnA * sB * sumB + mnB * sA * sumA +
        sA * sB * dotAB
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val codeA = ctx.freshName("codeA")
        val codeB = ctx.freshName("codeB")
        val mnA = ctx.freshName("mnA")
        val mnB = ctx.freshName("mnB")
        val sA = ctx.freshName("sA")
        val sB = ctx.freshName("sB")
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val la = ctx.freshName("la")
        val lb = ctx.freshName("lb")
        val sumA = ctx.freshName("sumA")
        val sumB = ctx.freshName("sumB")
        val dotAB = ctx.freshName("dotAB")
        s"""
           |final byte[] $codeA = $a.getBinary(0);
           |final double $mnA = $a.getDouble(1);
           |final double $sA = $a.getDouble(2);
           |final byte[] $codeB = $b.getBinary(0);
           |final double $mnB = $b.getDouble(1);
           |final double $sB = $b.getDouble(2);
           |final int $n = $codeA.length;
           |if ($codeB.length != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $sumA = 0L; long $sumB = 0L; long $dotAB = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    final int $la = ($codeA[$i] & 0xff) ^ 0x80;
           |    final int $lb = ($codeB[$i] & 0xff) ^ 0x80;
           |    $sumA += $la; $sumB += $lb; $dotAB += (long) $la * $lb;
           |  }
           |  ${ev.value} = $n * $mnA * $mnB + $mnA * $sB * $sumB
           |    + $mnB * $sA * $sumA + $sA * $sB * $dotAB;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Int8DotInt8 =
      copy(left = newLeft, right = newRight)
  }

  def int8_code(vec: Column): Column =
    ColumnShim.column(Int8Code(ColumnShim.expression(vec)))

  def int8_dot(q: Column, code: Column, mn: Column, scale: Column): Column =
    ColumnShim.column(Int8Dot(ColumnShim.expression(q),
      ColumnShim.expression(code), ColumnShim.expression(mn),
      ColumnShim.expression(scale)))

  def int8_dot_int8(a: Column, b: Column): Column =
    ColumnShim.column(Int8DotInt8(ColumnShim.expression(a),
      ColumnShim.expression(b)))
}
