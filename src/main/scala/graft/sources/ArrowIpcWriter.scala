package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.plugins.input.ArrowIpc

/** DataSourceV2 write path for Arrow IPC — the distributed mirror of
  * [[ArrowIpcSource]]'s batch-per-split read (reference surface:
  * `write_ipc`, docs/plugin_development.md:1239-1242).
  *
  * Each task streams ITS OWN partition into its own `.arrow` part
  * file (record batches of `batch_rows` rows — each batch is an
  * independently seekable split for the read side), staged under a
  * dotted temp name and atomically renamed on task commit. Nothing
  * ever materializes on the driver: a 10 TB frame writes on however
  * many cores hold its partitions, the same shape as Spark's parquet
  * sink. Overwrite mode truncates existing `.arrow` part files before
  * the tasks launch (driver-side, file metadata only).
  *
  * The old driver-side [[ArrowIpc.writeFile]] (collect + single file)
  * remains as the reference implementation this is tested against.
  */
private[sources] class IpcWriteBuilder(schema: StructType, rawPath: String,
                                       batchRows: Int)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new IpcBatchWrite(schema, rawPath, batchRows, doTruncate)
    override def description(): String =
      s"arrow-ipc write $rawPath (batchRows=$batchRows, truncate=$doTruncate)"
  }
}

private[sources] class IpcBatchWrite(schema: StructType, rawPath: String,
                                     batchRows: Int, doTruncate: Boolean)
    extends BatchWrite {

  /** Driver-side, before any task launches: create the directory and
    * (overwrite mode) clear previous part files — metadata ops only. */
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = Paths.get(rawPath)
    Files.createDirectories(dir)
    if (doTruncate) IpcBatchWrite.listIpcFiles(dir).foreach(Files.deleteIfExists)
    new IpcDataWriterFactory(schema, rawPath, batchRows)
  }

  /** Part files were already renamed into place by each task's commit;
    * the only driver work left is the empty-frame edge: zero tasks
    * committed ⇒ write a schema-only IPC file so a subsequent
    * `ipc_scan` of the directory still resolves and carries the schema. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (messages.isEmpty || messages.forall(_ == null)) {
      val empty = Paths.get(rawPath).resolve("part-00000-empty.arrow")
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val root = org.apache.arrow.vector.VectorSchemaRoot.create(
        ArrowIpc.toArrowSchema(schema), alloc)
      val ch = java.nio.channels.FileChannel.open(empty,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
      try {
        val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
        w.start(); w.end(); w.close()
      } finally { ch.close(); root.close(); alloc.close() }
    }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case IpcCommitMessage(p) => Files.deleteIfExists(Paths.get(p))
      case _ => ()
    }
    // sweep any temp files tasks left behind
    val dir = Paths.get(rawPath)
    if (Files.isDirectory(dir)) {
      val stream = Files.list(dir)
      try {
        stream.iterator().forEachRemaining { f =>
          if (f.getFileName.toString.endsWith(".arrow.tmp")) Files.deleteIfExists(f)
        }
      } finally stream.close()
    }
  }
}

private[sources] object IpcBatchWrite {
  def listIpcFiles(dir: Path): Seq[Path] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val stream = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.filter { f =>
        val n = f.getFileName.toString
        n.endsWith(".arrow") || n.endsWith(".ipc") || n.endsWith(".feather")
      }.toSeq
    } finally stream.close()
  }
}

private[sources] case class IpcCommitMessage(path: String) extends WriterCommitMessage

private[sources] class IpcDataWriterFactory(schema: StructType, dir: String,
                                            batchRows: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new IpcDataWriter(schema, Paths.get(dir), partitionId, taskId, batchRows)
}

/** Streams one task's rows into one IPC part file, a record batch at a
  * time — memory bound is `batch_rows` rows of Arrow buffers, never the
  * partition. The taskId in the name keeps speculative attempts from
  * colliding; rename-on-commit means readers only ever see complete
  * files. */
private[sources] class IpcDataWriter(schema: StructType, dir: Path,
                                     partitionId: Int, taskId: Long,
                                     batchRows: Int)
    extends DataWriter[InternalRow] {
  import org.apache.arrow.vector._

  private val tmp = dir.resolve(f".part-$partitionId%05d-$taskId.arrow.tmp")
  private val dest = dir.resolve(f"part-$partitionId%05d-$taskId.arrow")

  private val alloc = new org.apache.arrow.memory.RootAllocator()
  private val root = VectorSchemaRoot.create(ArrowIpc.toArrowSchema(schema), alloc)
  private val ch = java.nio.channels.FileChannel.open(tmp,
    StandardOpenOption.CREATE, StandardOpenOption.WRITE,
    StandardOpenOption.TRUNCATE_EXISTING)
  private val writer =
    try {
      val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(root, null, ch)
      w.start()
      w
    } catch { case e: Throwable => closeQuietly(); throw e }
  root.allocateNew()

  private val vectors: Array[FieldVector] =
    schema.fields.indices.map(root.getVector).toArray

  /** One closure per field, bound to its vector once — the per-row loop
    * is a flat array walk with no type dispatch. */
  private val setters: Array[(InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, j) =>
      (f.dataType, vectors(j)) match {
        case (StringType, v: VarCharVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getUTF8String(j).getBytes)
        case (ByteType, v: TinyIntVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getByte(j))
        case (ShortType, v: SmallIntVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getShort(j))
        case (IntegerType, v: IntVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getInt(j))
        case (LongType, v: BigIntVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getLong(j))
        case (FloatType, v: Float4Vector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getFloat(j))
        case (DoubleType, v: Float8Vector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getDouble(j))
        case (BooleanType, v: BitVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, if (row.getBoolean(j)) 1 else 0)
        // Catalyst already stores dates as epoch days and timestamps as
        // epoch micros — the Arrow physical layouts; no conversion.
        case (DateType, v: DateDayVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getInt(j))
        case (TimestampType, v: TimeStampMicroTZVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getLong(j))
        case (TimestampNTZType, v: TimeStampMicroVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getLong(j))
        case (BinaryType, v: VarBinaryVector) =>
          (row: InternalRow, i: Int) => v.setSafe(i, row.getBinary(j))
        case (t, v) => throw new IllegalArgumentException(
          s"Unsupported vector/type for IPC write: ${v.getClass.getSimpleName}/$t")
      }
    }.toArray

  private var i = 0
  private var closed = false

  override def write(row: InternalRow): Unit = {
    var j = 0
    while (j < setters.length) {
      if (row.isNullAt(j)) setNull(vectors(j), i) else setters(j)(row, i)
      j += 1
    }
    i += 1
    if (i >= batchRows) flush()
  }

  private def flush(): Unit = if (i > 0) {
    root.setRowCount(i)
    writer.writeBatch()
    root.allocateNew()
    i = 0
  }

  private def setNull(v: FieldVector, idx: Int): Unit = v match {
    case x: BaseFixedWidthVector => x.setNull(idx)
    case x: BaseVariableWidthVector => x.setNull(idx)
    case x: BaseLargeVariableWidthVector => x.setNull(idx)
    case other => throw new IllegalArgumentException(
      s"Cannot set null on ${other.getClass.getSimpleName}")
  }

  override def commit(): WriterCommitMessage = {
    flush()
    writer.end()
    closeQuietly()
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    IpcCommitMessage(dest.toString)
  }

  override def abort(): Unit = {
    closeQuietly()
    Files.deleteIfExists(tmp)
  }

  override def close(): Unit = closeQuietly()

  private def closeQuietly(): Unit = if (!closed) {
    closed = true
    try writer.close() catch { case _: Throwable => () }
    try ch.close() catch { case _: Throwable => () }
    try root.close() catch { case _: Throwable => () }
    try alloc.close() catch { case _: Throwable => () }
  }
}
