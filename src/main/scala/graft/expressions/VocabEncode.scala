package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Token→id encoding against a BROADCAST vocabulary: array<string> →
  * array<bigint>, position-preserving, out-of-vocabulary → `oovId`.
  *
  * The join-based spelling (posexplode → broadcast join → groupBy
  * collect_list) pays a reassembly shuffle of every (doc, pos, id)
  * row; this is a per-row projection — the vocabulary rides once per
  * executor as a broadcast hash map (vocabularies are bounded by
  * construction: 30k–5M entries, a few hundred MB at the extreme),
  * and the output inherits the input partitioning. The same
  * broadcast-handle pattern as [[BloomMightContain]]: never a plan
  * literal, so task binaries stay small.
  *
  * NULL array → NULL; NULL element → `oovId` (a missing token is
  * still a position in the sequence).
  */
case class VocabEncode(child: Expression,
                       vocab: Broadcast[java.util.HashMap[String, java.lang.Long]],
                       oovId: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vocab_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vocab_encode requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    val m = vocab.value
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) oovId
        else {
          val id = m.get(arr.getUTF8String(i).toString)
          if (id == null) oovId else id.longValue()
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): VocabEncode = copy(child = newChild)
}

object VocabEncode {
  def vocab_encode(tokens: Column,
                   vocab: Broadcast[java.util.HashMap[String, java.lang.Long]],
                   oovId: Long): Column =
    ColumnShim.column(VocabEncode(ColumnShim.expression(tokens), vocab, oovId))
}
