package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: local algorithms for document fingerprinting" — the
  * MOSS algorithm) as ONE per-row Catalyst expression: for each
  * window of `w` consecutive `k`-gram hashes, select the minimum
  * (rightmost position on ties) and return the distinct selected
  * `(pos, fp)` pairs, positions 1-based, ascending.
  *
  * This replaces a per-CHARACTER explode → per-doc window function →
  * w-fan-in self-join pipeline (three shuffles and ~corpus-characters
  * intermediate rows) with a single projection: the sliding-window
  * minimum runs in O(len) per document via a monotonic deque, and
  * only the SELECTED fingerprints (density 2/(w+1) of positions) ever
  * become rows. Embarrassingly parallel — the 100 TB shape is one
  * scan.
  *
  * Hash contract (oracle-portable, same as the SQL spelling it
  * replaces): `h(pos) = conv(substr(md5(substring(text, pos, k)), 1,
  * 8), 16, 10)` — the unsigned first 4 bytes of the md5 of the
  * k-gram's UTF-8 bytes. Grams are CODE-POINT windows (Spark's and
  * DuckDB's substring semantics), computed here as byte slices of the
  * UTF-8 buffer so no per-gram String materializes. Documents with
  * fewer than k+w-1 code points have no full window and return an
  * empty array (the SQL pipeline's full-window filter).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints requires string, got ${other.simpleString}")
    }

  // per-instance digest: tasks are single-threaded (same assumption
  // as SimHash64)
  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // code-point start offsets into the UTF-8 buffer (starts has one
    // trailing entry = bytes.length so gram i spans
    // [starts(i), starts(i + k)))
    var nCp = 0
    var off = 0
    while (off < bytes.length) {
      off += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(off))
      nCp += 1
    }
    val nGr = nCp - k + 1
    if (nGr < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nCp + 1)
    var cp = 0
    off = 0
    while (off < bytes.length) {
      starts(cp) = off
      off += org.apache.spark.unsafe.types.UTF8String
        .numBytesForFirstByte(bytes(off))
      cp += 1
    }
    starts(nCp) = bytes.length

    // per-gram hashes: unsigned first 4 bytes of md5(gram bytes)
    val h = new Array[Long](nGr)
    var i = 0
    while (i < nGr) {
      md5.reset()
      md5.update(bytes, starts(i), starts(i + k) - starts(i))
      val d = md5.digest()
      h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }

    // sliding-window minimum, rightmost tie: monotonic deque of
    // indices with strictly increasing h front→back; equal values pop
    // from the back so the NEWEST index survives — the front is then
    // the rightmost position holding the window minimum
    val selected = new Array[Boolean](nGr)
    val dq = new Array[Int](nGr)
    var head = 0
    var tail = 0 // exclusive
    var j = 0
    while (j < nGr) {
      while (tail > head && h(dq(tail - 1)) >= h(j)) tail -= 1
      dq(tail) = j
      tail += 1
      val ws = j - w + 1 // window [ws, j]
      if (ws >= 0) {
        while (dq(head) < ws) head += 1
        selected(dq(head)) = true
      }
      j += 1
    }

    val out = new java.util.ArrayList[Any]()
    var p = 0
    while (p < nGr) {
      if (selected(p)) out.add(InternalRow(p + 1, h(p)))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  import org.apache.spark.sql.graftshim.ColumnShim
  /** Column wrapper: winnow_fingerprints(textCol, k, w). */
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    ColumnShim.column(WinnowFingerprints(ColumnShim.expression(text), k, w))
}
