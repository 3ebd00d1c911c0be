package graft.expressions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-15 codegen parity gate: the hot candidate-stream kernels
  * (Int8Code / Int8Dot / Int8DotInt8 / LaneAgreement /
  * SortedLongJaccard / DotProductDouble) grew doGenCode. This pins
  * (a) the generated Java actually COMPILES — factoryMode
  * CODEGEN_ONLY turns a silent interpreted fallback into a hard
  * error — and (b) codegen results equal the interpreted path
  * bit-for-bit on edge inputs (nulls, length mismatch, empty and
  * degenerate vectors). */
class KernelCodegenSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = SharedSpark.spark

  private def kernelFrame(): DataFrame = {
    import spark.implicits._
    import graft.expressions.Int8Candidates._
    import graft.expressions.LaneAgreement._
    import graft.expressions.SortedLongJaccard._
    import graft.expressions.VectorKernels._
    val rows: Seq[(Array[java.lang.Double], Array[java.lang.Double],
        Array[Long], Array[Long])] = Seq(
      (Array[java.lang.Double](1.0, 2.0, 3.0),
        Array[java.lang.Double](0.5, -1.0, 2.0),
        Array(1L, 2L, 5L), Array(1L, 3L, 5L)),
      // degenerate constant vector (scale 0 -> all -128 codes)
      (Array[java.lang.Double](7.0, 7.0, 7.0),
        Array[java.lang.Double](0.0, 0.0, 0.0),
        Array(9L), Array(9L)),
      // null element -> null results on the double kernels
      (Array[java.lang.Double](1.0, null, 3.0),
        Array[java.lang.Double](2.0, 2.0, 2.0),
        Array.empty[Long], Array(4L)),
      // length mismatch between va and vb -> null dot
      (Array[java.lang.Double](1.0, 2.0),
        Array[java.lang.Double](1.0, 2.0, 3.0),
        Array(1L, 2L), Array.empty[Long]))
    val df = rows.toDF("va", "vb", "la", "lb")
    df.select(
        int8_code(col("va")).as("ca"), int8_code(col("vb")).as("cb"),
        col("va"), col("vb"), col("la"), col("lb"))
      .select(
        col("ca"), col("cb"),
        int8_dot(col("va"), col("cb.code"), col("cb.mn"), col("cb.scale"))
          .as("idot"),
        int8_dot_int8(col("ca"), col("cb")).as("iidot"),
        dot_product_double(col("va"), col("vb")).as("dot"),
        lane_agreement(col("la"), col("lb")).as("agree"),
        sorted_long_jaccard(col("la"), col("lb")).as("jac"))
  }

  private def withConfs(kv: (String, String)*)(f: => Seq[Row]): Seq[Row] = {
    val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("generated code compiles and matches the interpreted path " +
      "bit-for-bit on edge inputs") {
    val gen = withConfs(
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.fallback" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY") {
      kernelFrame().collect().toSeq
    }
    val interp = withConfs(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      kernelFrame().collect().toSeq
    }
    // canonicalize: byte[] toString is identity-based, compare content
    def canon(rows: Seq[Row]): Seq[Seq[Any]] = rows.map(_.toSeq.map {
      case r: Row => r.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }
      case x => x
    })
    assert(canon(gen) == canon(interp))
    // spot-pin a few values so BOTH paths changing together cannot
    // silently drift: row 0 agreement 2/3, jaccard 2/4
    assert(gen(0).getDouble(5) == 2.0 / 3.0)
    assert(gen(0).getDouble(6) == 0.5)
    // degenerate vb on row 1: scale 0, code -128, int8 dots finite
    assert(!gen(1).isNullAt(2) && !gen(1).isNullAt(3))
    // null element / length mismatch -> null double kernels
    assert(gen(2).isNullAt(4))
    assert(gen(3).isNullAt(4))
  }
}
