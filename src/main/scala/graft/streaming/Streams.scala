package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine (extension tier: the
  * reference's "streaming" is Polars' out-of-core sink, not event
  * streaming — SURVEY §1; this is the Spark-native generalization).
  *
  * The batch transform vocabulary carries over verbatim: a streaming
  * DataFrame is the same lazy plan type, so every TransformPlugin
  * (filter/select/with_column/...) composes onto `readStream` sources
  * unchanged. This module adds the genuinely streaming pieces:
  * watermarks, windowed aggregation, and custom session state.
  */
object Streams {

  /** Normalize an events-shaped frame's `ts` column to epoch NANOS
    * (long) — the representation all downstream window/session/join
    * arithmetic is written against. The fixture has shipped both
    * physical shapes across rounds: timestamp[ns] parquet (which
    * `nanosAsLong` surfaces as LongType nanos already) and
    * timestamp[us] (which arrives as TIMESTAMP/TIMESTAMP_NTZ). The
    * NTZ cast is value-preserving under the UTC session timezone
    * every graft session pins, and matches DuckDB's `epoch_ns(ts)`
    * on the same file. Works on batch and streaming frames alike
    * (pure projection). */
  def tsToNanos(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn(tsCol,
        graft.ops.TimeCols.epochNanos(df, tsCol))
    }

  /** events-shaped stream from a parquet directory. Schema must be
    * supplied for readStream; we take it from a batch footer read.
    * `ts` is normalized to epoch nanos ([[tsToNanos]]) and surfaced
    * as a proper timestamp column `event_time`. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    tsToNanos(spark.readStream.schema(schema).parquet(dir))
      .withColumn("event_time",
        (col("ts") / 1000000000L).cast("timestamp"))
  }

  /** Tumbling-window counts/sums per event type with a watermark:
    * state is bounded — windows older than the watermark are finalized
    * and evicted, which is what makes this run forever at scale. */
  def windowedAgg(events: DataFrame,
                  window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  final case class Event(user_id: Long, event_time: java.sql.Timestamp,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, nEvents: Int,
                                sumValue: Double)
  final case class SessionSummary(user_id: Long, session_start: Long,
                                  session_end: Long, n_events: Int,
                                  sum_value: Double)

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes when no event arrives
    * within `gapSeconds` of the last one (enforced via processing-time
    * timeout). State per user is O(1) — start/end/counters — so the
    * operator scales with distinct active users, not event volume.
    *
    * `timeout`: ProcessingTimeTimeout (default) flushes idle sessions
    * in continuous operation — but ties session closing to WALL-CLOCK
    * time, so results depend on batch pacing. EventTimeTimeout closes
    * a session when the WATERMARK passes `session_end + gap` —
    * deterministic under replay, the production-correct choice (the
    * input must carry a watermark on the event-time column). Pass
    * NoTimeout for batch-driven runs (Trigger.AvailableNow) where a
    * processing-time timer would keep the query alive forever; with
    * NoTimeout the trailing session per user simply stays in state,
    * which is exactly the append-mode semantics the oracle encodes
    * (with EventTimeTimeout, trailing sessions whose timeout
    * precedes the final watermark ARE flushed). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 timeout: GroupStateTimeout =
                   GroupStateTimeout.ProcessingTimeTimeout)(
      implicit spark: SparkSession): Dataset[SessionSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, s.start, s.end, s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.event_time.getTime)
            var closed = List.empty[SessionSummary]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.event_time.getTime / 1000
              cur match {
                case Some(s) if t - s.end <= gapSeconds =>
                  cur = Some(s.copy(end = t, nEvents = s.nEvents + 1,
                    sumValue = s.sumValue + e.value))
                case Some(s) =>
                  closed ::= SessionSummary(userId, s.start, s.end, s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
                state.setTimeoutDuration(gapSeconds * 1000)
              else if (timeout == GroupStateTimeout.EventTimeTimeout)
                state.setTimeoutTimestamp((s.end + gapSeconds) * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  final case class Obs(key: Long, event_time: java.sql.Timestamp,
                       value: Double)
  final case class FillState(lastSlot: Long, lastSec: Long,
                             lastValue: Double, lastN: Long)
  final case class FilledSlot(key: Long, slot_start: Long, value: Double,
                              n_obs: Long)

  /** Streaming time-grid resample + forward fill — the continuous
    * twin of [[graft.ops.Resample.forwardFill]], with explicit O(1)
    * per-key state (flatMapGroupsWithState): the state is the last
    * open slot's accumulators, never a buffer of events. When a new
    * event lands past the open slot, the open slot is emitted, gap
    * slots emit carrying its value forward, and the new slot opens.
    *
    * Emission contract (append mode): a slot is FINAL once emitted —
    * events arriving later for an emitted slot drop as late data,
    * the same horizon tradeoff as every watermarked operator here.
    * Within a batch, events process in (event_time, value) order, so
    * the slot representative is the batch operator's exact total
    * order (latest second, ties → max value); under an AvailableNow
    * single-batch replay the output EQUALS the batch operator row
    * for row, which is what the oracle checks. */
  def resampleStream(events: Dataset[Obs], stepSeconds: Long)(
      implicit spark: SparkSession): Dataset[FilledSlot] = {
    import spark.implicits._
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    events.groupByKey(_.key)
      .flatMapGroupsWithState[FillState, FilledSlot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Obs], state: GroupState[FillState]) =>
          val sorted = rows.toSeq
            .sortBy(e => (e.event_time.getTime, e.value))
          if (sorted.isEmpty) Iterator.empty
          else {
            val out = scala.collection.mutable.ListBuffer.empty[FilledSlot]
            // resume from the last EMITTED slot: its value feeds the
            // gap fill, its slot bound classifies late arrivals
            var cur: Option[FillState] = None
            val prev = state.getOption
            sorted.foreach { e =>
              val sec = e.event_time.getTime / 1000
              val slot = (sec / stepSeconds) * stepSeconds
              cur match {
                case None =>
                  prev match {
                    case Some(p) if slot <= p.lastSlot =>
                      () // late for an already-emitted slot -> drop
                    case Some(p) =>
                      // gap-fill forward from the last emitted slot
                      var g = p.lastSlot + stepSeconds
                      while (g < slot) {
                        out += FilledSlot(key, g, p.lastValue, 0L)
                        g += stepSeconds
                      }
                      cur = Some(FillState(slot, sec, e.value, 1L))
                    case None =>
                      cur = Some(FillState(slot, sec, e.value, 1L))
                  }
                case Some(s) if slot == s.lastSlot =>
                  val replace = sec > s.lastSec ||
                    (sec == s.lastSec && e.value > s.lastValue)
                  cur = Some(if (replace)
                    FillState(slot, sec, e.value, s.lastN + 1)
                  else s.copy(lastN = s.lastN + 1))
                case Some(s) => // slot > s.lastSlot (input is sorted)
                  out += FilledSlot(key, s.lastSlot, s.lastValue, s.lastN)
                  var g = s.lastSlot + stepSeconds
                  while (g < slot) {
                    out += FilledSlot(key, g, s.lastValue, 0L)
                    g += stepSeconds
                  }
                  cur = Some(FillState(slot, sec, e.value, 1L))
              }
            }
            cur.foreach { s =>
              out += FilledSlot(key, s.lastSlot, s.lastValue, s.lastN)
              state.update(s)
            }
            out.iterator
          }
      }
  }

  /** Streaming exact/fingerprint dedup:
    * `dropDuplicatesWithinWatermark` on the md5-of-normalized-text
    * fingerprint, so the dedup state stores one fingerprint per
    * distinct doc INSIDE the watermark horizon and EVICTS it once the
    * watermark passes — the bounded-state design continuous ingestion
    * needs (a plain `dropDuplicates("_fp")` keyed without the event
    * time never evicts: state grows by one entry per distinct doc
    * forever at 100 TB/day). Docs whose duplicate arrives later than
    * the watermark delay are the accepted tradeoff, exactly as in
    * production ingest dedup. */
  def dedupStream(docs: DataFrame, textCol: String, eventTimeCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("_fp", graft.ops.Text.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Stream-stream inner join within a time interval: each left row
    * matches right rows with the same key whose event time falls in
    * `[left_time - lookback, left_time]` — the attribution shape
    * (purchase ⋈ preceding clicks). Right-side columns are renamed
    * with `rightPrefix` so self-joins of one stream are legal.
    *
    * Both sides carry watermarks and the join condition bounds the
    * time range, which is what lets Spark EVICT buffered rows once
    * they can no longer match — state is O(events inside the
    * watermark + lookback horizon), not O(stream). A row whose match
    * arrives later than the watermark delay is dropped, the standard
    * streaming-join tradeoff; use a `watermark` ≥ the input's real
    * disorder (or, for batch-driven AvailableNow runs over a bounded
    * fixture, wider than the fixture's time span so the result is
    * exactly the batch interval join). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   timeCol: String, rightPrefix: String = "r_",
                   lookback: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark)
    val renamed = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c"))
    val r = renamed.withWatermark(s"$rightPrefix$timeCol", watermark)
    l.join(r,
      col(keyCol) === col(s"$rightPrefix$keyCol") &&
        col(s"$rightPrefix$timeCol") >= col(timeCol) - expr(s"INTERVAL $lookback") &&
        col(s"$rightPrefix$timeCol") <= col(timeCol))
  }

  /** Left-outer variant of [[intervalJoin]]: every left row emits —
    * matched rows as they join, unmatched rows null-extended once the
    * watermark guarantees no future right row can match (a right
    * match must satisfy `r.time <= l.time`, so a left row is safe to
    * emit-with-nulls as soon as the watermark passes `l.time`).
    * Unmatched left rows at or past the final watermark stay in
    * state and never emit under AvailableNow — the same trailing-edge
    * rule as windowed aggregation. A batch oracle replicates it with
    * the cutoff `l.time < min(max(l.time), max(r.time)) - delay`:
    * the GLOBAL watermark is the minimum over both watermarked
    * streams' maxima (each side's watermark only sees its own
    * filtered rows), so when the right stream trails the left, the
    * right side's maximum governs — a max-over-all-input spelling
    * over-emits the moment the left stream outruns the right. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, keyCol: String,
                            timeCol: String, rightPrefix: String = "r_",
                            lookback: String = "30 minutes",
                            watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(timeCol, watermark)
    val renamed = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c"))
    val r = renamed.withWatermark(s"$rightPrefix$timeCol", watermark)
    l.join(r,
      col(keyCol) === col(s"$rightPrefix$keyCol") &&
        col(s"$rightPrefix$timeCol") >= col(timeCol) - expr(s"INTERVAL $lookback") &&
        col(s"$rightPrefix$timeCol") <= col(timeCol),
      "left_outer")
  }

  /** Streaming CDC compaction: maintain a "latest event per key"
    * parquet table from a change stream via `foreachBatch`, merging
    * `state' = Scd.latest(state ∪ batch)`.
    *
    * The merge is ASSOCIATIVE and IDEMPOTENT (latest-per-key of a
    * union), so the final state is independent of how the stream was
    * micro-batched and safe under foreachBatch's at-least-once
    * replays — the property that makes this compaction correct
    * without any transactional table format. Each batch writes a
    * fresh versioned directory and atomically swaps it in (local
    * filesystem rename; on an object store you would target a table
    * format's commit protocol instead — the merge logic is the
    * portable part). State size is O(distinct keys), not O(stream).
    */
  def upsertLatest(events: DataFrame, keyCols: Seq[String],
                   orderCols: Seq[String], statePath: String,
                   checkpoint: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    def rmTree(p: Path): Unit = if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(x => Files.deleteIfExists(x))
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val cur =
          if (Files.exists(Paths.get(statePath)))
            Some(spark.read.parquet(statePath))
          else None
        val merged = graft.ops.Scd.latest(
          cur.map(_.unionByName(batch)).getOrElse(batch),
          keyCols, orderCols)
        val staged = Paths.get(statePath + s"_v$batchId")
        rmTree(staged) // left over from a replayed batch: rebuild
        merged.write.mode("overwrite").parquet(staged.toString)
        rmTree(Paths.get(statePath))
        Files.move(staged, Paths.get(statePath))
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run a streaming frame to completion against currently-available
    * input (memory sink) and return the materialized result — the
    * batch-driven smoke harness for streaming queries. */
  def runToMemory(df: DataFrame, queryName: String,
                  outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(queryName)
  }
}
