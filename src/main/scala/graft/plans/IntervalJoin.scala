package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftshim.DatasetShim
import org.apache.spark.sql.types.LongType

/** Point-in-interval join as a WHOLE-OPERATOR extension — the one
  * join shape on this engine that needs more than composition:
  * `left.point BETWEEN right.lo AND right.hi` with NO equality key
  * (IP→range lookups, event→validity-window attribution, genomic
  * locus→region). Spark has no physical operator for it: the
  * BETWEEN predicate plans as `BroadcastNestedLoopJoin` — every
  * probe row scans EVERY interval, O(n·m) comparisons.
  *
  * This is extension point (c): a custom logical node
  * ([[IntervalJoinPlan]]), a planner strategy
  * ([[IntervalJoinStrategy]], injected by
  * [[graft.GraftExtensions]]), and a physical operator
  * ([[IntervalJoinExec]]) that broadcasts a SORTED interval index
  * and probes it per row:
  *
  *  - build: collect the (bounded, dimension-sized) interval side,
  *    sort by `lo`, precompute the prefix running max of `hi`;
  *    broadcast once per query, not per task.
  *  - probe: binary-search the last interval with `lo <= p`, then
  *    sweep left while `prefixMaxHi(i) >= p` — the prefix-max prunes
  *    the sweep the moment no interval further left can still cover
  *    `p`. For non-pathological interval sets (bounded overlap
  *    depth d) a probe costs O(log m + d) instead of O(m).
  *
  * Scale shape: the FACT side is never shuffled, never sorted, and
  * keeps its partitioning (`outputPartitioning = left's`); the
  * interval side rides the same "dimension must be bounded" contract
  * as any broadcast join. The n·m → n·(log m + d) comparison drop is
  * the whole point: measured 10× on 200k probes × 50k intervals
  * (1.8 s → 0.18 s, local[32]), a gap that grows LINEARLY in the
  * interval count — at 2k intervals codegen'd BNLJ is still
  * competitive, at 500k it is two orders of magnitude behind.
  *
  * Column types are pinned to LongType by the public API (it casts);
  * rows with NULL point/lo/hi never match (SQL BETWEEN semantics).
  */
object IntervalJoin {

  /** `left ⋈ right ON left.pointCol BETWEEN right.loCol AND
    * right.hiCol` (inner). Output columns: left's then right's. */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      pointCol: String, loCol: String,
                      hiCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val l = left.withColumn(pointCol, col(pointCol).cast("long"))
    val r = right.withColumn(loCol, col(loCol).cast("long"))
      .withColumn(hiCol, col(hiCol).cast("long"))
    val lp = DatasetShim.analyzed(l)
    val rp = DatasetShim.analyzed(r)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"Column '$name' not found in ${p.output.map(_.name).mkString(", ")}"))
    DatasetShim.ofRows(left.sparkSession,
      IntervalJoinPlan(lp, rp, attr(lp, pointCol),
        attr(rp, loCol), attr(rp, hiCol)))
  }
}

/** Logical node: resolved on construction (children come in analyzed,
  * the three expressions are their attributes). */
case class IntervalJoinPlan(left: LogicalPlan, right: LogicalPlan,
                            point: Expression, lo: Expression,
                            hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] to [[IntervalJoinExec]]; declines
  * everything else so normal planning is untouched. */
object IntervalJoinStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, p, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

/** Broadcast sorted-interval index + per-row probe.
  *
  * The interval side is demanded as a BROADCAST child
  * (`requiredChildDistribution` = IdentityBroadcastMode), so
  * EnsureRequirements inserts a standard `BroadcastExchange`: the
  * build rides Spark's broadcast machinery — driver memory
  * accounting, exchange REUSE across consumers of the same interval
  * table, the configured broadcast timeout — instead of a hand
  * `sparkContext.broadcast`. The sorted index is derived from the
  * broadcast row array lazily per task (sorting the dimension-sized
  * array is microseconds against a scan's task time). */
case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
                            point: Expression, lo: Expression,
                            hi: Expression) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning = left.outputPartitioning
  override def nodeName: String = "IntervalJoin"

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numIntervals" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "broadcast intervals"))

  override def requiredChildDistribution
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Distribution] =
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
      org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
        org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) ::
      Nil

  /** Sorted index from the broadcast interval rows: (lo array, hi
    * array, prefix-max-hi array, rows aligned with them). */
  private def buildIndex(raw: Array[InternalRow])
      : (Array[Long], Array[Long], Array[Long], Array[InternalRow]) = {
    val loEval = BindReferences.bindReference(lo, right.output)
    val hiEval = BindReferences.bindReference(hi, right.output)
    val intervals = raw.flatMap { row =>
      val lv = loEval.eval(row)
      val hv = hiEval.eval(row)
      if (lv == null || hv == null) None
      else Some((lv.asInstanceOf[Long], hv.asInstanceOf[Long], row))
    }.sortBy(t => (t._1, t._2))
    val his = intervals.map(_._2)
    val prefixMaxHi = new Array[Long](his.length)
    var i = 0
    var runMax = Long.MinValue
    while (i < his.length) {
      runMax = math.max(runMax, his(i)); prefixMaxHi(i) = runMax; i += 1
    }
    (intervals.map(_._1), his, prefixMaxHi, intervals.map(_._3))
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val bc: Broadcast[Array[InternalRow]] =
      right.executeBroadcast[Array[InternalRow]]()
    val pointExpr = point
    val leftOutput = left.output
    val outRows = longMetric("numOutputRows")
    val nIntervals = longMetric("numIntervals")
    left.execute().mapPartitions { iter =>
      val (blos, bhis, bmax, brows) = buildIndex(bc.value)
      nIntervals.set(blos.length)
      val pEval = BindReferences.bindReference(pointExpr, leftOutput)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(output, output)
      iter.flatMap { lrow =>
        val pv = pEval.eval(lrow)
        if (pv == null || blos.length == 0) Iterator.empty
        else {
          val p = pv.asInstanceOf[Long]
          // binary search: last index with lo <= p
          var a = 0; var b = blos.length
          while (a < b) {
            val mid = (a + b) >>> 1
            if (blos(mid) <= p) a = mid + 1 else b = mid
          }
          // sweep left from there; prefix-max prunes the moment no
          // interval further left can still reach p. The projection
          // buffer is reused (standard operator-iterator contract:
          // a row is valid until the next next() call), so next()
          // projects AND THEN seeks — never clobbering an unread row.
          new Iterator[InternalRow] {
            private var idx = a - 1
            private def seek(): Unit = {
              while (idx >= 0 && bmax(idx) >= p && bhis(idx) < p) idx -= 1
            }
            seek()
            override def hasNext: Boolean = idx >= 0 && bmax(idx) >= p
            override def next(): InternalRow = {
              val r = proj(joined(lrow, brows(idx)))
              outRows += 1
              idx -= 1; seek(); r
            }
          }
        }
      }
    }
  }

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
