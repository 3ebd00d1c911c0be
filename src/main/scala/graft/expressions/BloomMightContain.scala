package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a BROADCAST Bloom filter — the executor
  * side of [[graft.ops.IncrementalDedup]].
  *
  * The filter travels as a `Broadcast[Array[Byte]]` handle, NOT as a
  * plan literal: a reference corpus of 10^9 keys at 1% FPP is a
  * ~1.2 GB bit array, which a literal would re-ship inside every task
  * binary while a broadcast lands on each executor once (torrent
  * blocks) and is shared by all its tasks. Deserialized lazily per
  * task thread from the executor-local bytes.
  *
  * Semantics: `might_contain(key)` — false means DEFINITELY absent
  * (the guarantee incremental dedup builds on), true means "present
  * or false positive" (callers re-verify exactly). NULL key → false,
  * matching anti-join semantics where a NULL key never equals
  * anything and is always kept.
  */
case class BloomMightContain(child: Expression,
                             filterBytes: Broadcast[Array[Byte]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires string or integral key, " +
          s"got ${other.simpleString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes.value))

  @transient private lazy val isString = child.dataType == StringType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return false
    if (isString) {
      // mightContainString hashes the UTF-8 bytes — identical to what
      // `DataFrameStatFunctions.bloomFilter` put for a string column
      // (putString → getBytesFromUTF8String), so zero false negatives
      // by construction. Pinned by IncrementalDedupSpec.
      bloom.mightContainBinary(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    } else {
      val l = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      bloom.mightContainLong(l)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def might_contain(key: Column, filterBytes: Broadcast[Array[Byte]]): Column =
    ColumnShim.column(
      BloomMightContain(ColumnShim.expression(key), filterBytes))
}
