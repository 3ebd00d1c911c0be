package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Ordered funnel analysis: for each key, how deep into the step
  * sequence did it get, matching each step to its EARLIEST event
  * strictly after the previous step's match (the standard greedy
  * funnel — earliest-match maximizes reachable depth, so the result
  * is unambiguous). Emits the matched epoch-nano timestamps per
  * step, null from the first uncompleted step on.
  *
  * Determinism: pure integer min/compare arithmetic on epoch nanos —
  * no floats anywhere. The greedy chain is computed by a single
  * time-ordered scan per key; within equal timestamps the result is
  * order-independent (at most one step can match at any instant — a
  * chain of two matches at the same nanosecond is impossible under
  * the strict `>`), so the (t, step) tie-break is determinism
  * hygiene, not semantics.
  *
  * Scale shape (round 15, guide §2.4/§2.5): ONE keyed exchange of
  * the step-typed event slice, shared by the per-key count, the
  * bounded collect and the overflow slice (the old spelling paid one
  * keyed shuffle of the event table PER STEP plus a per-step
  * aggregation and join-back). Flood safety: per-key arrays are only
  * collected for keys whose step-event count is ≤ `maxEventsPerKey`;
  * hotter keys take a spill path — a streaming per-partition scan
  * with O(steps) state, exact at any per-key volume — so no
  * aggregation buffer ever holds an unbounded hub key. No collect to
  * the driver, no window over raw events. */
object Funnel {

  /** `(keyCol, funnel_depth, t_<step1>, t_<step2>, ...)`.
    * `maxSpanSeconds`: when set, steps beyond the first must also
    * land within that span of the FIRST step's match (the
    * conversion-window form; the window anchors at the earliest
    * first-step event — the standard product-analytics contract).
    * `maxEventsPerKey`: flood cap for the per-key collected array;
    * keys above it are computed exactly on the streaming spill path
    * (results are identical — see the cap-engagement test). */
  def depth(df: DataFrame, keyCol: String, tsCol: String,
            typeCol: String, steps: Seq[String],
            maxSpanSeconds: Option[Long] = None,
            maxEventsPerKey: Int = 8192): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"duplicate steps: ${steps.diff(steps.distinct).mkString(", ")}")
    require(maxEventsPerKey >= 1,
      s"maxEventsPerKey must be >= 1, got $maxEventsPerKey")
    val nSteps = steps.size
    val spanNs = maxSpanSeconds.map(_ * 1000000000L)

    val ev = df.select(col(keyCol),
      TimeCols.epochNanos(df, tsCol).as("_t"), col(typeCol).as("_ty"))
    // every distinct key appears in the output (depth 0 when nothing
    // matched) — partial-agg distinct, shuffles unique keys only
    val keys = ev.select(col(keyCol)).distinct()

    // step-typed skinny slice: (key, t, stepIndex). Null keys are
    // dropped HERE: a null key can never join back to `keys` (SQL
    // null equality), so computing its funnel would be wasted work —
    // and a giant null-key group must not reach the collect below.
    val stepIdx = steps.zipWithIndex.foldLeft(lit(null).cast("int")) {
      case (acc, (st, i)) => when(col("_ty") === st, lit(i)).otherwise(acc)
    }
    val evS = ev.select(col(keyCol), col("_t"), stepIdx.as("_si"))
      .filter(col(keyCol).isNotNull && col("_t").isNotNull &&
        col("_si").isNotNull)

    // THE one corpus-scale exchange. Everything downstream (count,
    // anti/semi routing, the final groupBy) reuses this partitioning
    // (guide §2.4: operations keyed the same way share one exchange).
    val evX = evS.repartition(col(keyCol))

    // per-key step-event counts route keys to the bounded collect or
    // the spill path; count state is O(1) per key, so the hub key
    // that motivates the cap cannot flood THIS aggregation.
    // SHUFFLE_HASH pin on the routing joins (round-12 rule): the
    // over-cap key set is post-agg-filter, so its size estimate is
    // fabricated — never let the static planner broadcast it blind;
    // the hash build is n/P single-column uniform-id rows.
    val overKeys = evX.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxEventsPerKey)
      .select(col(keyCol))

    // greedy earliest-match scan over the time-sorted event array as
    // a fold: state = the matched-time prefix; an event matches iff
    // it is the NEXT step, strictly after the last match, and inside
    // the conversion window. Equivalent to the per-step min chain:
    // processing events in ascending (t, step) order, the first
    // type-d event strictly after t_{d-1} IS min{t : type d, t > t_{d-1}}.
    def greedyScan(evs: Column): Column =
      aggregate(evs, array().cast("array<long>"), (st, e) => {
        val d = size(st)
        val t = e.getField("_t")
        val prev = coalesce(get(st, d - 1), lit(Long.MinValue))
        val spanOk = spanNs.map(ns =>
          d === 0 || t <= get(st, lit(0)) + lit(ns)).getOrElse(lit(true))
        when(d < nSteps && e.getField("_si") === d && t > prev && spanOk,
          concat(st, array(t))).otherwise(st)
      })

    // main path: per-key sorted struct-array (≤ maxEventsPerKey rows
    // by the anti-join) + the greedy fold. The groupBy reuses evX's
    // partitioning — no second exchange.
    val mainRes = evX
      .join(overKeys.hint("SHUFFLE_HASH"), Seq(keyCol), "left_anti")
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("_t"), col("_si"))))
        .as("_evs"))
      .select(col(keyCol), greedyScan(col("_evs")).as("_mts"))

    // spill path (over-cap keys only): stream each group in
    // (key, t, step) order with O(steps) state — exact at any per-key
    // volume, no array ever materialized. flatMapSortedGroups is used
    // (not mapPartitions over "already-partitioned" rows) because
    // MapGroups DECLARES its ClusteredDistribution requirement, so no
    // AQE rewrite (skew-split of the semi join, local shuffle reads)
    // can ever slice a hub key across tasks; a bare mapPartitions
    // declares nothing and the planner is free to break key
    // contiguity under it. Groups key on xxhash64(key) so the typed
    // API needs no encoder for the caller's key type; a (vanishingly
    // unlikely) hash collision only co-groups two keys, which the
    // key-change detection inside the scan handles exactly.
    val overRes = {
      val slice = evX
        .join(overKeys.hint("SHUFFLE_HASH"), Seq(keyCol), "left_semi")
        .select(col(keyCol), col("_t"), col("_si"),
          xxhash64(col(keyCol)).as("_gk"))
      val outSchema = StructType(Seq(
        slice.schema(keyCol),
        StructField("_mts", ArrayType(LongType, containsNull = true))))
      slice.groupBy(col("_gk"))
        .as(Encoders.scalaLong, Encoders.row(slice.schema))
        .flatMapSortedGroups(col(keyCol), col("_t"), col("_si")) {
          (_: Long, rows: Iterator[Row]) =>
            new scala.collection.AbstractIterator[Row] {
              private val buf = rows.buffered
              def hasNext: Boolean = buf.hasNext
              def next(): Row = {
                val k = buf.head.get(0)
                val ts = scala.collection.mutable.ArrayBuffer.empty[Long]
                while (buf.hasNext &&
                    java.util.Objects.equals(buf.head.get(0), k)) {
                  val r = buf.next()
                  val t = r.getLong(1)
                  if (ts.length < nSteps && r.getInt(2) == ts.length &&
                      t > (if (ts.isEmpty) Long.MinValue else ts.last) &&
                      (spanNs.isEmpty || ts.isEmpty ||
                        t <= ts.head + spanNs.get))
                    ts += t
                }
                Row(k, ts.toSeq)
              }
            }
        }(Encoders.row(outSchema))
    }

    keys.join(mainRes.unionByName(overRes), Seq(keyCol), "left")
      .select(col(keyCol) +:
        when(col("_mts").isNull, lit(0L))
          .otherwise(size(col("_mts")).cast("long")).as("funnel_depth") +:
        steps.zipWithIndex.map { case (st, i) =>
          get(col("_mts"), lit(i)).as(s"t_$st")
        }: _*)
  }
}
