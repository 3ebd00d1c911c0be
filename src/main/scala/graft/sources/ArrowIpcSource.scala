package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 for Arrow IPC (Feather v2) files — the distributed
  * scale path for the `ipc_scan` surface (ref ipc_scan.py:20-52; the
  * reference reads IPC via Polars' native scanner).
  *
  * Spark has no built-in Arrow-IPC source; the driver-side bridge in
  * [[graft.plugins.input.ArrowIpc]] materializes the whole file on
  * one machine. This source instead plans ONE InputPartition PER
  * RECORD BATCH (the IPC footer lists batch offsets, so planning is
  * a footer-only read per file), and each task seeks directly to its
  * batch — a 100 GB IPC dataset of 1000 batches reads on 1000 cores
  * with no driver materialization, the same split model Spark's
  * parquet source uses for row groups.
  *
  * Column pruning is pushed into the scan: only the projected
  * vectors are converted (`SupportsPushDownRequiredColumns`), so
  * `select(one_col)` touches one buffer per batch. Filters stay in
  * Spark — IPC has no row-group statistics to push into (unlike
  * parquet), so there is nothing to prune with file-side.
  *
  * Usage: `spark.read.format("arrow-ipc").load(path)` where `path`
  * is a `.arrow` file or a directory of them.
  */
class ArrowIpcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrow-ipc"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("arrow-ipc: 'path' is required"))
    ArrowIpcSource.resolvePaths(p)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.plugins.input.ArrowIpc.readSchema(
      java.nio.file.Paths.get(paths(options).head))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val raw = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("arrow-ipc: 'path' is required"))
    // keep the raw path: for writes the target may not exist yet, so
    // file resolution is deferred to scan-building time
    new IpcTable(schema, raw,
      Option(opts.get("batch_rows")).map(_.toInt).getOrElse(1 << 16))
  }

  override def supportsExternalMetadata(): Boolean = true
}

object ArrowIpcSource {
  /** `.arrow`/`.ipc`/`.feather` file, or a directory of them (sorted).
    * Shared with IpcScanPlugin's dry-run so schema probing accepts
    * exactly what execution accepts. */
  def resolvePaths(p: String): Seq[String] = {
    val path = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.isDirectory(path)) {
      val stream = java.nio.file.Files.list(path)
      try {
        import scala.jdk.CollectionConverters._
        val files = stream.iterator().asScala
          .filter { f =>
            val n = f.getFileName.toString
            n.endsWith(".arrow") || n.endsWith(".ipc") || n.endsWith(".feather")
          }
          .map(_.toString).toSeq.sorted
        if (files.isEmpty)
          throw new IllegalArgumentException(s"arrow-ipc: no IPC files in $p")
        files
      } finally stream.close()
    } else Seq(p)
  }
}

private[sources] class IpcTable(schema: StructType, rawPath: String,
                                batchRows: Int)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"arrow-ipc($rawPath)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IpcScanBuilder(schema, ArrowIpcSource.resolvePaths(rawPath))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new IpcWriteBuilder(info.schema(), rawPath,
      Option(info.options.get("batch_rows")).map(_.toInt).getOrElse(batchRows))
}

private[sources] class IpcScanBuilder(fullSchema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file field order for the vector lookup; Spark re-projects
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new IpcScan(required, files)
}

private[sources] class IpcScan(schema: StructType, files: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"arrow-ipc ${files.size} file(s), ReadSchema: ${schema.simpleString}"

  /** One split per record batch: a footer-only read per file lists
    * the batch blocks; no batch data is touched on the driver. */
  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { f =>
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(f))
      try {
        val reader = new org.apache.arrow.vector.ipc.ArrowFileReader(ch, alloc)
        try (0 until reader.getRecordBlocks.size())
          .map(i => IpcPartition(f, i): InputPartition)
        finally reader.close()
      } finally { ch.close(); alloc.close() }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new IpcReaderFactory(schema)
}

private[sources] case class IpcPartition(file: String, blockIndex: Int)
    extends InputPartition

private[sources] class IpcReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new IpcPartitionReader(partition.asInstanceOf[IpcPartition], schema)
}

/** Reads exactly one record batch: seeks via the footer block entry,
  * loads the batch, converts only the projected vectors. */
private[sources] class IpcPartitionReader(p: IpcPartition, schema: StructType)
    extends PartitionReader[InternalRow] {
  import org.apache.arrow.vector.ipc.ArrowFileReader

  private val alloc = new org.apache.arrow.memory.RootAllocator()
  private val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(p.file))
  private val reader =
    try new ArrowFileReader(ch, alloc)
    catch { case e: Throwable => close(); throw e }
  // a corrupt/truncated batch must not leak the channel/allocator:
  // Spark only close()s readers it received, never ones whose
  // construction threw
  private val vectors =
    try {
      reader.loadRecordBatch(reader.getRecordBlocks.get(p.blockIndex))
      val root = reader.getVectorSchemaRoot
      schema.fields.map(f => root.getVector(f.name))
    } catch { case e: Throwable => close(); throw e }
  private val rowCount = reader.getVectorSchemaRoot.getRowCount
  private val toCatalyst = schema.fields.map(f =>
    CatalystTypeConverters.createToCatalystConverter(f.dataType))
  private var i = -1

  override def next(): Boolean = { i += 1; i < rowCount }

  override def get(): InternalRow = {
    val values = new Array[Any](vectors.length)
    var j = 0
    while (j < vectors.length) {
      val cell = graft.plugins.input.ArrowIpc.cellValue(vectors(j), i)
      values(j) = if (cell == null) null else toCatalyst(j)(cell)
      j += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = {
    try { if (reader != null) reader.close() }
    finally { ch.close(); alloc.close() }
  }
}
