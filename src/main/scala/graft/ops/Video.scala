package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** REAL video support: AVI is a RIFF container (the same chunk
  * grammar [[Audio]] walks for WAV), and Motion-JPEG stores each
  * frame as a plain JPEG — which [[Multimodal.decodeJpeg]] already
  * decodes via the JDK codec. So the classic training-pipeline video
  * op — container walk → frame sample → per-frame decode/stats —
  * ships fully real, pure-JVM: [[parseAvi]] finds the `movi` LIST
  * and extracts `00dc`/`00db` frame chunks; [[sampleVideoFrames]]
  * explodes a clip into every `stride`-th frame with decoded pixel
  * statistics.
  *
  * Scale shape: one pass per payload inside `mapPartitions` (a clip
  * is decoded by exactly one task, no shuffle, no driver); the
  * explode is bounded by `maxFrames`. Inter-frame codecs (H.264 &
  * co) genuinely need a codec library this container lacks — their
  * AVIs parse (container metadata is real) but frames decode to NULL
  * stats, never a throw. */
object Video {

  /** Container-level metadata from the `avih` main header. */
  final case class AviInfo(width: Int, height: Int,
                           microSecPerFrame: Int, declaredFrames: Int)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Build a minimal standards-shaped MJPG AVI: RIFF(AVI ) with an
    * hdrl LIST (avih + one vids/MJPG strl) and a movi LIST of one
    * `00dc` chunk per frame (word-aligned). Used by specs and the
    * oracled fixture generator. */
  def encodeAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                fps: Int = 10): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte)
        else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++
      le32(0x10) /* HASINDEX-free flags */ ++ le32(frames.size) ++
      le32(0) ++ le32(1) ++ le32(0) ++ le32(width) ++ le32(height) ++
      Array.fill(16)(0.toByte)
    val strh = "vids".getBytes("US-ASCII") ++
      "MJPG".getBytes("US-ASCII") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) /* scale */ ++ le32(fps) /* rate */ ++ le32(0) ++
      le32(frames.size) ++ le32(0) ++ le32(0) ++ le32(0) ++
      Array.fill(8)(0.toByte)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      le32(width.toLong * height * 3) ++ Array.fill(16)(0.toByte)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", f)))
    val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(form.length))
    bos.write(form)
    bos.toByteArray
  }

  /** Walk a RIFF/AVI container: `avih` metadata + raw frame payloads
    * from the `movi` LIST (`##dc`/`##db` chunks, any stream number).
    * None — never a throw — for non-AVI bytes, truncated containers,
    * or corrupt sizes. Frame payloads are NOT decoded here; callers
    * pick the codec ([[Multimodal.decodeImage]] for MJPG). Frame
    * count is bounded (64k) against corrupt headers. */
  def parseAvi(bytes: Array[Byte]): Option[(AviInfo, Seq[Array[Byte]])] = {
    if (bytes == null || bytes.length < 24) return None
    if (fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ")
      return None
    try {
      var info: Option[AviInfo] = None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def isFrameId(id: String): Boolean =
        id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db")
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var i = from
        while (i + 8 <= to) {
          val id = fourCC(bytes, i)
          val len = u32le(bytes, i + 4)
          if (len < 0 || len > Int.MaxValue - 8) return
          val body = i + 8
          val end = body + len.toInt
          if (end > to) return // truncated chunk
          if (id == "LIST" && len >= 4) {
            val kind = fourCC(bytes, body)
            walk(body + 4, end, inMovi || kind == "movi")
          } else if (id == "avih" && len >= 40) {
            info = Some(AviInfo(
              width = u32le(bytes, body + 32).toInt,
              height = u32le(bytes, body + 36).toInt,
              microSecPerFrame = u32le(bytes, body).toInt,
              declaredFrames = u32le(bytes, body + 16).toInt))
          } else if (inMovi && isFrameId(id) && frames.size < 65536) {
            frames += java.util.Arrays.copyOfRange(bytes, body, end)
          }
          i = end + (len.toInt & 1) // word alignment
        }
      }
      walk(12, bytes.length, inMovi = false)
      info.map(inf => (inf, frames.toSeq))
    } catch { case _: Throwable => None }
  }

  val frameStatsType: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("frame_ms", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("pixel_sum", LongType, nullable = true),
    StructField("n_values", LongType, nullable = true)))

  /** Explode AVI payloads into sampled frames with decoded pixel
    * stats: one output row per every-`stride`-th frame (capped at
    * `maxFrames` rows per clip), carrying the frame's timestamp from
    * the container fps and NULL pixel stats where the frame payload
    * doesn't decode (inter-frame codecs, corrupt frame). Non-AVI
    * payloads produce zero rows. Runs per-partition, no shuffle. */
  def sampleVideoFrames(df: DataFrame, idCol: String, payloadCol: String,
                        stride: Int = 1, maxFrames: Int = 256): DataFrame = {
    require(stride >= 1 && maxFrames >= 1)
    val outSchema = StructType(
      df.schema(idCol) +: frameStatsType.fields.toSeq)
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val parsed = if (payload == null) None else parseAvi(payload)
        parsed.toSeq.flatMap { case (info, frames) =>
          frames.indices.by(stride).take(maxFrames).map { fi =>
            // Seq[Any], not Seq(...): mixed Int/Long elements would
            // otherwise unify to Seq[Long] via weak conformance and
            // silently widen the Int fields out of the row schema
            val stats: Seq[Any] = Multimodal.decodeImage(frames(fi)) match {
              case Some(img) => Seq[Any](img.width, img.height,
                img.channels,
                img.pixels.map(_ & 0xff).map(_.toLong).sum,
                img.pixels.length.toLong)
              case None => Seq(null, null, null, null, null)
            }
            Row.fromSeq(r.get(idIdx) +: (Seq[Any](fi, frames.size,
              fi.toLong * info.microSecPerFrame / 1000L) ++ stats))
          }
        }
      }
    }
  }
}
