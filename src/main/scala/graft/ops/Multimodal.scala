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
  * Metadata extraction (format/width/height) is REAL for PNG, JPEG
  * and GIF — pure-JVM container-header parsing, no codec library
  * needed ([[parseHeader]]). Only pixel-level work (resize content,
  * frame decode) remains a clearly-marked deterministic STUB (media
  * codec libraries are not in this container); the schema,
  * partition-wise execution, batch shape and metadata struct around
  * it are real and tested. Unrecognized bytes fall back to
  * [[decodeStub]] so text-shaped fixtures stay deterministic.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decoder: derives deterministic fake metadata from the raw
    * bytes (length-based dimensions + additive checksum). Used as the
    * fallback when [[parseHeader]] does not recognize the container —
    * a real pixel decoder would live behind the same dispatch. */
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

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** REAL container-header parsing in pure JVM bytes — no codec
    * library needed for dimensions/format:
    *
    *  - PNG: 8-byte signature, then the IHDR chunk is mandated first
    *    (width/height big-endian u32 at offsets 16/20).
    *  - GIF: `GIF87a`/`GIF89a` magic, then the logical screen
    *    descriptor (width/height little-endian u16 at offsets 6/8).
    *  - JPEG: SOI marker, then walk segments to the first SOF marker
    *    (C0–CF except C4/C8/CC); height/width are big-endian u16 in
    *    its payload. Standalone markers (RSTn/TEM) have no length.
    *
    * Returns None for unrecognized or truncated bytes (caller falls
    * back to [[decodeStub]]). */
  def parseHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def isPng =
      bytes.length >= 24 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G' && bytes(4) == 0x0d && bytes(5) == 0x0a &&
        bytes(6) == 0x1a && bytes(7) == 0x0a &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R'
    def isGif =
      bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'
    def isJpeg =
      bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

    if (isPng) Some(("png", u32be(bytes, 16), u32be(bytes, 20)))
    else if (isGif) Some(("gif", u16le(bytes, 6), u16le(bytes, 8)))
    else if (isJpeg) {
      var i = 2
      while (i + 4 <= bytes.length && (bytes(i) & 0xff) == 0xff) {
        val marker = bytes(i + 1) & 0xff
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else {
          val len = u16be(bytes, i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 9 > bytes.length) return None
            return Some(("jpeg", u16be(bytes, i + 7), u16be(bytes, i + 5)))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Decode metadata: real header parsing where the container is
    * recognized, the deterministic stub otherwise. The checksum is
    * the additive byte sum either way (content fingerprint). */
  def decode(bytes: Array[Byte]): Row = parseHeader(bytes) match {
    case Some((fmt, w, h)) =>
      var checksum = 0L
      var i = 0
      while (i < bytes.length) { checksum += (bytes(i) & 0xff); i += 1 }
      Row(bytes.length.toLong, fmt, w, h, checksum)
    case None => decodeStub(bytes)
  }

  /** Minimal valid-header writers (PNG/JPEG/GIF) for fixtures and
    * tests: real magic bytes, real dimension encoding, real PNG CRC —
    * exactly what [[parseHeader]] consumes. */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13).put("IHDR".getBytes("US-ASCII"))
    out.putInt(width).putInt(height)
    out.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(out.array(), 12, 17) // chunk type + data
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  def jpegHeader(width: Int, height: Int, progressive: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(27)
    out.put(0xff.toByte).put(0xd8.toByte)                  // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(2)      // empty APP0
    out.put(0xff.toByte).put(if (progressive) 0xc2.toByte else 0xc0.toByte)
    out.putShort(17).put(8.toByte)                         // len, precision
    out.putShort(height.toShort).putShort(width.toShort)
    out.put(3.toByte)                                      // 3 components
    out.put(Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    out.put(0xff.toByte).put(0xd9.toByte)                  // EOI
    out.array()
  }

  def gifHeader(width: Int, height: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GIF89a".getBytes("US-ASCII"))
    out.putShort(width.toShort).putShort(height.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)          // packed/bg/aspect
    out.put(0x3b.toByte)                                   // trailer
    out.array()
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
        val meta = if (payload == null) null else decode(payload)
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
