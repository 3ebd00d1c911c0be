package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles without per-group array collection.
  *
  * Spark's `percentile()` is a TypedImperativeAggregate that buffers
  * EVERY value of the group in memory — fine at 60k rows, an OOM at
  * 100 TB. This construction is all sort + window + one aggregation:
  *
  *   rn  = row_number over (group, value-order)
  *   n   = count over group
  *   h_p = (n-1)·p;  lo = ⌊h⌋+1;  frac = h-⌊h⌋
  *   q_p = v[lo] + frac·(v[lo+1] − v[lo])     (linear interpolation,
  *                                             same as SQL quantile_cont)
  *
  * Cost: one range shuffle for the window sort, then a partial+final
  * agg that keeps only the two boundary rows per (group, percentile).
  * Memory per task is O(1).
  */
object Percentiles {

  /** Returns `keys :+ p_<label> ...` with one column per requested
    * percentile. `ps` are (label, fraction) pairs.
    *
    * NULL values are ignored — the same semantics as SQL
    * `percentile`/`quantile_cont` (ranking them would shift every
    * percentile; `_n` must count VALUES, not rows). Groups whose
    * values are all NULL still appear, with NULL percentiles, via the
    * key-restoring left join. */
  def exactInterpolated(df: DataFrame, keys: Seq[String], valueCol: String,
                        ps: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    val cnt = Window.partitionBy(keys.map(col): _*)
    // the unbounded count window rides the SAME exchange as the
    // row_number sort; an agg + broadcast-join alternative measured
    // slightly slower (extra stage barrier) at sf0.1
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(cnt))
    finishFromRanked(ranked, df, keys, valueCol, ps)
  }

  /** Shared tail: `ranked` needs (keys..., valueCol, _rn, _n) rows
    * that INCLUDE every group's boundary ranks (lo, lo+1 per
    * percentile); extra rows are harmless. */
  private def finishFromRanked(ranked: DataFrame, df: DataFrame,
                               keys: Seq[String], valueCol: String,
                               ps: Seq[(String, Double)]): DataFrame = {
    val aggs = ps.flatMap { case (label, p) =>
      val h = (col("_n") - 1) * lit(p)
      val lo = floor(h) + 1
      val frac = h - floor(h)
      Seq(
        max(when(col("_rn") === lo, col(valueCol))).as(s"_lo_$label"),
        max(when(col("_rn") === lo + 1, col(valueCol))).as(s"_hi_$label"),
        max(when(col("_rn") === lo, frac)).as(s"_frac_$label"))
    }
    val out = ranked.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val computed = ps.foldLeft(out) { case (acc, (label, _)) =>
      acc.withColumn(label,
        col(s"_lo_$label") + col(s"_frac_$label") *
          (coalesce(col(s"_hi_$label"), col(s"_lo_$label")) - col(s"_lo_$label")))
        .drop(s"_lo_$label", s"_hi_$label", s"_frac_$label")
    }
    // groups whose every value was NULL dropped out of `ranked`;
    // SQL percentile still emits them (with NULL) — restore via the
    // original key set (tiny agg + broadcast-able join). NULL-SAFE
    // equality: a NULL key is a legal GROUP BY group in both Spark
    // and SQL, and `=` would orphan it (NULL percentiles for a group
    // that has values).
    // (computed's keys are renamed first — both sides descend from
    // `df`, and same-name columns across a self-join lineage trip
    // Spark's ambiguity heuristics)
    val keyDf = df.select(keys.map(col): _*).distinct()
    val renamed = computed.select(
      keys.map(k => col(k).as(s"_ck_$k")) ++
        ps.map { case (label, _) => col(label) }: _*)
    val joinCond = keys.map(k => col(k) <=> col(s"_ck_$k")).reduce(_ && _)
    keyDf.join(renamed, joinCond, "left")
      .select(keys.map(col) ++ ps.map { case (label, _) => col(label) }: _*)
  }

  /** Exact interpolated percentiles by DISTRIBUTED SELECTION — the
    * low-cardinality-group scale path.
    *
    * [[exactInterpolated]]'s window hash-partitions by the group
    * keys, so 100 TB with 4 groups sorts on 4 tasks. Here the sort is
    * a RANGE partition on (keys, value): a big group spans many
    * partitions and every core sorts a slice. Then
    *
    *   pass 1: per-(partition, group) row counts — a tiny aggregate
    *           (partitions × groups rows) collected and turned into
    *           each partition's global in-group START RANK plus each
    *           group's needed boundary ranks {lo, lo+1} per
    *           percentile;
    *   pass 2: mapPartitions walks its sorted slice with a running
    *           rank and emits ONLY boundary rows (groups × ps × 2
    *           total), which the shared interpolation tail reduces.
    *
    * Both passes are full-parallel scans; nothing per-group is
    * serialized. The driver handles only O(partitions × groups)
    * count rows — the same scale class as a groupBy().count()
    * collect, not data. Value is surfaced as DOUBLE (interpolation
    * output type). NULL values are ignored, NULL keys are legal
    * groups, all-NULL groups come back with NULL percentiles — same
    * contract as [[exactInterpolated]], property-tested equal.
    *
    * Crossover: measured at sf0.1/local[32] (600k rows, 4 groups) the
    * window path wins (1.3 s vs 2.5 s) — three jobs plus a persist
    * don't amortize on sub-million-row groups. Use this variant when
    * rows-per-group ≫ rows a single task should sort (billions of
    * rows over a handful of groups); use [[exactInterpolated]] when
    * group count ≥ cluster parallelism. */
  def exactInterpolatedBySelection(df: DataFrame, keys: Seq[String],
                                   valueCol: String,
                                   ps: Seq[(String, Double)],
                                   numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sortCols = keys.map(col) :+ col(valueCol)
    val parted = df
      .filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ col(valueCol).cast("double").as(valueCol): _*)
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist()

    // pass 1: (pid, group) -> count; tiny (partitions × groups)
    val countRows = parted
      .groupBy(spark_partition_id().as("_pid") +: keys.map(col): _*)
      .count().collect()
    val nKeys = keys.length
    val groupOf: org.apache.spark.sql.Row => Seq[Any] =
      r => (0 until nKeys).map(i => r.get(i + 1))
    var totals = Map.empty[Seq[Any], Long]
    var starts = Map.empty[(Int, Seq[Any]), Long]
    countRows.sortBy(_.getInt(0)).foreach { r =>
      val g = groupOf(r)
      val c = r.getLong(nKeys + 1)
      starts += ((r.getInt(0), g) -> totals.getOrElse(g, 0L))
      totals += (g -> (totals.getOrElse(g, 0L) + c))
    }
    val needed: Map[Seq[Any], Set[Long]] = totals.map { case (g, n) =>
      g -> ps.flatMap { case (_, frac) =>
        val lo = math.floor((n - 1) * frac).toLong + 1
        Seq(lo, math.min(lo + 1, n))
      }.toSet
    }
    val startsB = spark.sparkContext.broadcast(starts)
    val neededB = spark.sparkContext.broadcast(needed)
    val totalsB = spark.sparkContext.broadcast(totals)

    // pass 2: emit only boundary rows, with (_rn, _n) attached
    val outSchema = org.apache.spark.sql.types.StructType(
      keys.map(k => parted.schema(k)) ++ Seq(
        parted.schema(valueCol),
        org.apache.spark.sql.types.StructField("_rn",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("_n",
          org.apache.spark.sql.types.LongType, nullable = false)))
    implicit val enc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val boundary = parted.mapPartitions { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var curKey: Seq[Any] = null
      var rank = 0L
      var want: Set[Long] = Set.empty
      var n = 0L
      rows.flatMap { r =>
        val g = (0 until nKeys).map(i => r.get(i))
        if (g != curKey) {
          curKey = g
          rank = startsB.value.getOrElse((pid, g), 0L)
          want = neededB.value.getOrElse(g, Set.empty)
          n = totalsB.value.getOrElse(g, 0L)
        }
        rank += 1
        if (want.contains(rank))
          Some(org.apache.spark.sql.Row.fromSeq(
            g :+ r.getDouble(nKeys) :+ rank :+ n))
        else None
      }
    }
    // boundary is ≤ groups × ps × 2 rows — bounded by the
    // low-cardinality contract — so collecting it both materializes
    // the selection pass and lets the range-partitioned cache go
    // WITHOUT leaving a persisted frame behind (a .persist here would
    // accumulate one cache entry per call in long-lived sessions)
    val boundaryRows = boundary.collect().toIndexedSeq
    parted.unpersist(blocking = false)
    val small = spark.createDataFrame(
      spark.sparkContext.parallelize(boundaryRows, 1), outSchema)
    finishFromRanked(small, df, keys, valueCol, ps)
  }

  /** Crossover-AUTOMATIC exact percentiles: picks the execution shape
    * from measured input statistics, so callers stop choosing.
    *
    * The tradeoff both variants document: [[exactInterpolated]]'s
    * window hash-partitions by group, so sort parallelism = #groups —
    * at 100 TB with 4 groups that is 4 tasks each sorting a quarter
    * of the corpus; the selection variant range-partitions (every
    * core sorts a slice) but pays three jobs plus a persist. The
    * documented measurement (see [[exactInterpolatedBySelection]]):
    * those jobs do NOT amortize on sub-million-row groups even at
    * low cardinality — window wins 1.3 s vs 2.5 s on 600k rows × 4
    * groups. Selection wins only when BOTH hold: group count below
    * the cluster's parallelism (otherwise groups already saturate
    * it) AND rows-per-group beyond what one task should sort
    * (`maxRowsPerTask`, default 8M — a single-task in-memory sort of
    * that size is seconds; beyond it the window path's per-group
    * tasks become stragglers, then spills, then OOMs). Both stats
    * come from ONE cheap aggregation job (`approx_count_distinct` ±
    * few % is irrelevant against order-of-magnitude thresholds).
    * Output contract is identical on both sides (property-tested
    * equal). */
  def exactInterpolatedAuto(df: DataFrame, keys: Seq[String],
                            valueCol: String,
                            ps: Seq[(String, Double)],
                            maxRowsPerTask: Long = 8000000L): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val stats = df.agg(
      approx_count_distinct(struct(keys.map(col): _*)).as("_g"),
      count(lit(1)).as("_n")).head()
    val nGroups = math.max(stats.getLong(0), 1L)
    val nRows = stats.getLong(1)
    if (nGroups < par && nRows / nGroups > maxRowsPerTask)
      exactInterpolatedBySelection(df, keys, valueCol, ps)
    else exactInterpolated(df, keys, valueCol, ps)
  }

  /** Keep only the rows whose `valueCol` sits inside the per-group
    * percentile band `[lo, hi]` — the distribution-relative trim
    * every quality gate ends with ("drop the shortest 5% and the
    * longest 5% per language" rather than a fixed threshold that
    * means something different in every stratum). Appends `prCol` =
    * the row's `percent_rank` within its group.
    *
    * Rank-based, not interpolated: `percent_rank = (rank−1)/(n−1)`
    * is an exact IEEE division of two small integers (deterministic
    * cross-engine; ties share a rank, so equal values are kept or
    * dropped together — a band can never split a tie). Rows with
    * NULL `valueCol` are dropped (a band over an unknown value has
    * no meaning). Single-row groups rank 0.0 and survive any band
    * containing 0.
    *
    * Scale shape: one window over the (group, value) sort — the same
    * single range-shuffle as [[exactInterpolated]]; the band filter
    * is applied before the projection, so downstream sees only
    * surviving rows. */
  def filterByBand(df: DataFrame, keys: Seq[String], valueCol: String,
                   lo: Double, hi: Double,
                   prCol: String = "pct_rank"): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      s"band must satisfy 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .withColumn(prCol, percent_rank().over(w))
      .filter(col(prCol) >= lo && col(prCol) <= hi)
  }
}
