package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns plus a typed metadata
  * struct, processed per-partition so a real decoder (JNI/ffmpeg/
  * imageio) would stream batches without driver involvement.
  *
  * The decode step itself is a clearly-marked deterministic STUB
  * (media codec libraries are not in this container); everything
  * around it — schema, partition-wise execution, batch shape,
  * metadata struct — is real and tested. Swap `decodeStub` for a
  * real codec to productionize.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decoder: derives deterministic fake metadata from the raw
    * bytes (length-based dimensions + additive checksum). A real
    * implementation would parse the container header here. */
  def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum += (bytes(i) & 0xff); i += 1 }
    val format = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    val width = (64 + (n % 64)).toInt
    val height = (64 + (checksum % 64)).toInt
    Row(n, format, width, height, checksum)
  }

  /** Attach decoded metadata to a frame with a binary `payloadCol`.
    * mapPartitions keeps the decoder invocation per-executor-batch
    * (the shape a JNI codec needs); everything stays distributed. */
  def withDecodedMeta(df: DataFrame, payloadCol: String,
                      out: String = "media_meta"): DataFrame = {
    val schema = df.schema.add(out, mediaMetaType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val meta = if (payload == null) null else decodeStub(payload)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
  }

  /** STUB resize: keep every `factor`-th byte of the payload — the
    * deterministic stand-in for a real downsample (a codec would
    * decode, scale, re-encode here). Shape is the real thing: a
    * binary→binary map with no driver involvement, composable with
    * [[withDecodedMeta]] for post-resize metadata. */
  def resizeStub(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor > 0, "factor must be positive")
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Attach a resized copy of a binary `payloadCol` (per-partition
    * batches, like [[withDecodedMeta]]). */
  def withResized(df: DataFrame, payloadCol: String, factor: Int,
                  out: String = "resized"): DataFrame = {
    val schema = df.schema.add(out, BinaryType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized = if (payload == null) null else resizeStub(payload, factor)
        Row.fromSeq(r.toSeq :+ resized)
      }
    }
  }

  /** Deterministic "frame sampling" stub for video-shaped payloads:
    * split the payload into `frames` equal slices and emit one row per
    * sampled slice with its offset — the partitioning/explode shape of
    * real frame extraction. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   frames: Int): DataFrame =
    df.select(col(idCol), col(payloadCol).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("offset", (col("frame_idx") * col("n_bytes") / frames).cast("long"))
      .withColumn("frame_bytes",
        expr(s"substring(payload, offset + 1, greatest(cast(n_bytes / $frames as int), 1))"))
      .drop("payload")
}
