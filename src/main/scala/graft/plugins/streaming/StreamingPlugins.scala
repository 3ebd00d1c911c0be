package graft.plugins.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.core.{Errors, InputPlugin, OutputPlugin, PluginExecutionError}

/** Streaming face of the pipeline: the SAME config format and the
  * SAME transform plugins, with streaming sources/sinks. A streaming
  * DataFrame is the same lazy plan type, so the whole §2B transform
  * vocabulary (filter/select/with_column/group_by_agg/...) composes
  * unchanged between `parquet_stream_scan` and `stream_parquet_writer`.
  *
  * The sink runs with `Trigger.AvailableNow`: process everything
  * currently in the landing directory through the streaming engine
  * (micro-batches, checkpointed offsets, exactly-once file sink),
  * then stop — the batch-driven mode of a continuously-running
  * pipeline. Re-running the same config picks up only NEW files via
  * the checkpoint: incremental ingestion from a config file.
  */
class ParquetStreamScanPlugin(val options: Map[String, Any],
                              val configDir: Path,
                              override val label: String)
    extends InputPlugin {
  def name: String = "parquet_stream_scan"

  private def inputPath(): Either[Throwable, Path] =
    options.get("input_path") match {
      case None => Left(new PluginExecutionError("Option 'input_path' is required"))
      case Some(p) =>
        val resolved = resolvePath(p.toString)
        if (!Files.isDirectory(resolved))
          Left(new PluginExecutionError(
            s"Streaming input must be a directory of files: $resolved"))
        else Right(resolved)
    }

  def execute()(implicit spark: SparkSession): Either[Throwable, DataFrame] =
    inputPath().flatMap { p =>
      Errors.safe {
        // schema from the current files' footers (required by readStream)
        val schema = spark.read.parquet(p.toString).schema
        val reader = spark.readStream.schema(schema)
        // bound per-micro-batch work on a flooded landing dir
        // (backfill catch-up) — the standard ingestion rate limit
        val limited = options.get("max_files_per_trigger")
          .map(v => reader.option("maxFilesPerTrigger",
            v.toString.toDouble.toInt.toString))
          .getOrElse(reader)
        limited.parquet(p.toString)
      }
    }

  def dryRun()(implicit spark: SparkSession): Either[Throwable, StructType] =
    inputPath().flatMap(p => Errors.safe(spark.read.parquet(p.toString).schema))
}

/** Streaming parquet sink with checkpointed exactly-once semantics. */
class StreamParquetWriterPlugin(val options: Map[String, Any],
                                val configDir: Path,
                                override val label: String)
    extends OutputPlugin {
  def name: String = "stream_parquet_writer"

  private def outputPath(): Either[Throwable, Path] =
    options.get("output_path") match {
      case None => Left(new PluginExecutionError("Option 'output_path' is required"))
      case Some(p) => Right(resolvePath(p.toString))
    }

  def execute(df: DataFrame): Either[Throwable, Unit] =
    outputPath().flatMap { p =>
      Errors.safe {
        if (!df.isStreaming)
          throw new PluginExecutionError(
            s"$name requires a streaming input (use parquet_stream_scan)")
        val checkpoint = options.get("checkpoint")
          .map(c => resolvePath(c.toString).toString)
          .getOrElse(p.toString + "_checkpoint")
        val mode = options.get("output_mode").map(_.toString).getOrElse("append")
        val q = df.writeStream
          .format("parquet")
          .option("path", p.toString)
          .option("checkpointLocation", checkpoint)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    outputPath().flatMap { p =>
      Errors.safe {
        val parent = p.toAbsolutePath.getParent
        if (parent != null) Files.createDirectories(parent)
        schema
      }
    }
}

/** Streaming CDC-compaction sink ([[graft.streaming.Streams.upsertLatest]]):
  * maintains a latest-event-per-key parquet state table via
  * `foreachBatch` merge. The merge is associative + idempotent, so
  * the state is batch-boundary-independent and safe under
  * foreachBatch's at-least-once replays. Options: output_path (req —
  * the state table), key_columns, order_columns (req, lists),
  * checkpoint (default `<output>_checkpoint`). */
class StreamUpsertWriterPlugin(val options: Map[String, Any],
                               val configDir: Path,
                               override val label: String)
    extends OutputPlugin {
  def name: String = "stream_upsert_writer"

  private def outputPath(): Either[Throwable, Path] =
    options.get("output_path") match {
      case None => Left(new PluginExecutionError("Option 'output_path' is required"))
      case Some(p) => Right(resolvePath(p.toString))
    }

  private def stringList(key: String): Either[Throwable, Seq[String]] =
    options.get(key) match {
      case Some(xs: Seq[_]) => Right(xs.map(_.toString))
      case Some(s) => Right(Seq(s.toString))
      case None => Left(new PluginExecutionError(
        s"Option '$key' is required"))
    }

  def execute(df: DataFrame): Either[Throwable, Unit] =
    for {
      p <- outputPath()
      keys <- stringList("key_columns")
      order <- stringList("order_columns")
      _ <- Errors.safe {
        if (!df.isStreaming)
          throw new PluginExecutionError(
            s"$name requires a streaming input (use parquet_stream_scan)")
        val checkpoint = options.get("checkpoint")
          .map(c => resolvePath(c.toString).toString)
          .getOrElse(p.toString + "_checkpoint")
        graft.streaming.Streams.upsertLatest(df, keys, order,
          p.toString, checkpoint)
      }
    } yield ()

  def dryRun(schema: StructType): Either[Throwable, StructType] =
    for {
      p <- outputPath()
      keys <- stringList("key_columns")
      order <- stringList("order_columns")
      out <- (keys ++ order).find(c => !schema.fieldNames.contains(c))
        .map(c => Left(new graft.core.SchemaValidationError(
          s"Column '$c' not found in schema")): Either[Throwable, StructType])
        .getOrElse(Errors.safe {
          val parent = p.toAbsolutePath.getParent
          if (parent != null) Files.createDirectories(parent)
          schema
        })
    } yield out
}

/** Streaming snapshot sink: every micro-batch COMMITS an immutable
  * [[graft.sources.Snapshots]] version via foreachBatch, keyed by the
  * batch id — a replayed batch (failure retry, checkpoint restart)
  * is a no-op, so the version history is effectively-once without a
  * transaction log. Continuous ingestion with time travel: any past
  * version stays readable via `snapshot_scan` while new batches land.
  * Options: output_path (req — the snapshot directory), checkpoint
  * (default <output_path>_checkpoint). */
class StreamSnapshotWriterPlugin(val options: Map[String, Any],
                                 val configDir: Path,
                                 override val label: String)
    extends OutputPlugin {
  def name: String = "stream_snapshot_writer"

  private def outputPath(): Either[Throwable, Path] =
    options.get("output_path") match {
      case None => Left(new PluginExecutionError("Option 'output_path' is required"))
      case Some(p) => Right(resolvePath(p.toString))
    }

  def execute(df: DataFrame): Either[Throwable, Unit] =
    outputPath().flatMap { p =>
      Errors.safe {
        if (!df.isStreaming)
          throw new PluginExecutionError(
            s"$name requires a streaming input (use parquet_stream_scan)")
        val checkpoint = options.get("checkpoint")
          .map(c => resolvePath(c.toString).toString)
          .getOrElse(p.toString + "_checkpoint")
        val q = df.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            graft.sources.Snapshots.writeBatch(batch, p.toString, batchId)
            ()
          }
          .option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }

  def dryRun(schema: org.apache.spark.sql.types.StructType)
      : Either[Throwable, org.apache.spark.sql.types.StructType] =
    outputPath().map(_ => schema)
}
