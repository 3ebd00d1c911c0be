package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over byte-window k-shingles of a (normalized)
  * string, all `numHashes` lanes in a single pass — the standard
  * shingle→minhash construction (Broder 1997, "On the resemblance and
  * containment of documents"; MMDS ch.3).
  *
  * Why a custom Catalyst expression (preference tier b): composed from
  * built-ins this is `transform(shingles, s => xxhash64(s, seed))`
  * nested per lane — higher-order functions run interpreted (no
  * codegen, no common-subexpression elimination), so the shingle array
  * materializes per lane and every element pays boxing overhead
  * (measured ~13 s for 500 docs × 64 lanes at sf0.01). This expression
  * does one O(len × (k + lanes)) loop over the UTF8 bytes per row:
  * base hash per byte-window, then a cheap long-mix per lane —
  * microseconds per row, embarrassingly parallel, no shuffle.
  *
  * Per-lane mix: the classic ONE-HASH construction — hash each
  * shingle once (xxh64), then derive lane j by the affine map
  * `a_j·h + b_j (mod 2^64)` with fixed odd multipliers (a multiply
  * and an add, vs a full xxh64 finalizer per lane; the family used by
  * Spark MLlib's MinHashLSH, mod-prime variant). Per-lane uniformity
  * comes from the odd-multiplier mixing of 2^64 arithmetic; the
  * candidate-superset property this feeds (`dedup_ngram_verified`) is
  * hash-oracled against a quadratic exact verifier, so a regression
  * in the family's mixing would fail correctness, not just drift.
  *
  * Shingles are BYTE windows (not codepoint windows): identical for
  * ASCII, still deterministic, valid shingling for any input.
  * Duplicate shingles need no dedup — min() absorbs them.
  */
case class MinHashSignature64(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature64 requires string, got ${other.simpleString}")
    }

  // Deterministic affine family: lane j is h ↦ a(j)·h + b(j) over
  // 2^64, multipliers forced odd (bijective). Seeded from fixed
  // golden-ratio constants so signatures are stable across runs and
  // executors.
  @transient private lazy val laneA: Array[Long] =
    Array.tabulate(numHashes)(j =>
      XXH64.hashLong(j.toLong, 0x9E3779B97F4A7C15L) | 1L)
  @transient private lazy val laneB: Array[Long] =
    Array.tabulate(numHashes)(j =>
      XXH64.hashLong(j.toLong, 0xC2B2AE3D27D4EB4FL))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val a = laneA
    val b = laneB
    // Short strings hash as one whole-string shingle, mirroring the
    // array form's `when(length < k, array(t))` branch.
    val windows = if (len < shingleK) 1 else len - shingleK + 1
    val width = if (len < shingleK) len else shingleK
    var i = 0
    while (i < windows) {
      val h = XXH64.hashUnsafeBytes(base, offset + i, width, 42L)
      var j = 0
      while (j < numHashes) {
        val v = a(j) * h + b(j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature64 =
    copy(child = newChild)
}

object MinHashSignature64 {
  def minhash_signature64(normalizedText: Column, k: Int, n: Int): Column =
    ColumnShim.column(
      MinHashSignature64(ColumnShim.expression(normalizedText), k, n))
}
