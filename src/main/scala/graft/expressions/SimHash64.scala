package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an array of tokens — near-duplicate text
  * fingerprinting (Charikar 2002, "Similarity estimation techniques
  * from rounding algorithms"; the Google near-dup crawl dedup of
  * Manku et al., WWW'07).
  *
  * A custom Catalyst `Expression` rather than a Scala UDF: operates on
  * `UTF8String` bytes directly (no JVM String materialization per
  * token), so per-row cost is one token-bytes digest plus a 64-lane
  * counter update. Per-row and shuffle-free — embarrassingly parallel
  * at 100 TB.
  *
  * The per-token 64-bit hash is the BIG-ENDIAN FIRST 8 BYTES OF MD5
  * (same cross-engine rationale as `Text.fingerprint`): md5 exists in
  * every SQL engine, so the full signature — and therefore the
  * Hamming-distance pair set — is exactly reproducible in the DuckDB
  * oracle. xxhash64 would be ~5× cheaper per token but is not
  * portable; signature cost is a tiny fraction of the scan either way.
  *
  * Implements the reference-free extension tier (SURVEY §7 step 8);
  * near-dup semantics follow the public SimHash literature, not any
  * reference code.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString}")
    }

  // One digest instance per expression instance (plans deserialize one
  // per task; MessageDigest is not thread-safe but tasks are
  // single-threaded — same assumption as HyperplaneSignature64's table).
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        md5.reset()
        val digest = md5.digest(tok.getBytes)
        // big-endian first 8 bytes → the same value DuckDB reads off
        // the first 16 hex chars of md5(token)
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (digest(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.graftshim.ColumnShim
  /** Column wrapper: simhash64(tokensArrayCol). */
  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))
}
