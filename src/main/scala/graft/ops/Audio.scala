package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** REAL audio support for multimodal pipelines: RIFF/WAVE PCM-16 is an
  * uncompressed container the JVM can parse with plain byte math — no
  * codec library — so unlike the image stubs of early rounds, audio
  * decode ships fully real: container walk ([[decodeWav]]), sample
  * extraction, and the standard first-pass features a training-data
  * pipeline computes per clip ([[withAudioFeatures]]): duration,
  * RMS loudness, zero-crossing rate (the classic cheap voicing /
  * noisiness signal), and peak amplitude.
  *
  * Scale shape: decode + features run inside `mapPartitions` batches
  * (one pass per payload, no driver involvement, no shuffle); a clip
  * never needs to be seen by more than one task. Compressed formats
  * (MP3/AAC/Opus) genuinely need a codec library this container
  * lacks — they are detected by magic and rejected to the same
  * NULL-struct contract as undecodable images, never a throw.
  *
  * The `multimodal_audio` oracle replays the ENTIRE path in SQL:
  * fixtures are integer triangle waves (closed-form sample values —
  * deliberately NOT float sine, whose libm last-bit differences
  * between engines could flip a rounding), so DuckDB re-derives every
  * PCM sample with integer arithmetic and aggregates the identical
  * RMS/ZCR/peak.
  */
object Audio {

  /** Decoded clip: interleaved PCM-16 samples. `channels` ≥ 1;
    * `samples.length` is a multiple of `channels`. */
  final case class WavClip(sampleRate: Int, channels: Int,
                           samples: Array[Short])

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Encode interleaved PCM-16 samples as a canonical RIFF/WAVE file
    * (fmt + data chunks, little-endian). Used by the specs and the
    * oracled fixture generator. */
  def encodeWav(clip: WavClip): Array[Byte] = {
    require(clip.channels >= 1, "channels must be >= 1")
    require(clip.samples.length % clip.channels == 0,
      "interleaved sample count must be a multiple of channels")
    val dataLen = clip.samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1)                                   // PCM
    bb.putShort(clip.channels.toShort)
    bb.putInt(clip.sampleRate)
    bb.putInt(clip.sampleRate * clip.channels * 2)   // byte rate
    bb.putShort((clip.channels * 2).toShort)         // block align
    bb.putShort(16)                                  // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    clip.samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse a RIFF/WAVE container and extract PCM-16 samples. Walks
    * chunks (tolerating LIST/INFO and other metadata chunks in any
    * order before `data`), validates the fmt contract (PCM, 16-bit),
    * and bounds the allocation (64 M samples). None — never a throw —
    * for anything else: truncated, compressed (MP3/OGG magic or
    * non-PCM fmt codes), float WAV, or corrupt sizes. */
  def decodeWav(bytes: Array[Byte]): Option[WavClip] = {
    if (bytes == null || bytes.length < 44) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E')) return None
    try {
      var i = 12
      var sampleRate = 0
      var channels = 0
      var fmtOk = false
      var data: Option[(Int, Int)] = None // (offset, byteLen)
      while (i + 8 <= bytes.length && data.isEmpty) {
        val id = new String(bytes, i, 4, "US-ASCII")
        val len = u32le(bytes, i + 4)
        if (len < 0 || len > Int.MaxValue - 8) return None
        val body = i + 8
        id match {
          case "fmt " =>
            if (body + 16 > bytes.length) return None
            val codec = u16le(bytes, body)
            channels = u16le(bytes, body + 2)
            sampleRate = u32le(bytes, body + 4).toInt
            val bits = u16le(bytes, body + 14)
            fmtOk = codec == 1 && bits == 16 && channels >= 1 &&
              sampleRate > 0
          case "data" =>
            if (!fmtOk) return None // fmt must precede data
            data = Some((body, len.toInt))
          case _ => () // LIST, fact, cue… skip
        }
        i = body + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
      data match {
        case Some((off, byteLen)) if fmtOk =>
          val avail = math.min(byteLen.toLong, (bytes.length - off).toLong)
          val nSamples = (avail / 2).toInt
          if (nSamples.toLong > 64L * 1024 * 1024) return None
          if (avail < byteLen) return None // truncated data chunk
          val frames = nSamples / channels
          val n = frames * channels // drop a ragged trailing half-frame
          val out = new Array[Short](n)
          var k = 0
          while (k < n) {
            out(k) = ((bytes(off + k * 2) & 0xff) |
              (bytes(off + k * 2 + 1) << 8)).toShort
            k += 1
          }
          Some(WavClip(sampleRate, channels, out))
        case _ => None
      }
    } catch { case _: Throwable => None }
  }

  val audioFeaturesType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  /** Single-pass clip features from the decoded samples:
    *  - `rms` — sqrt(mean(s²)) over ALL interleaved samples;
    *  - `zero_crossings` — strict sign flips (s·s' < 0) between
    *    CONSECUTIVE samples of the SAME channel, summed over
    *    channels (zeros break a run — no crossing through silence);
    *  - `peak` — max |s|;
    *  - `duration_ms` — frames·1000/rate, floor (integer math).
    */
  def features(clip: WavClip): Row = {
    val ch = clip.channels
    var sumSq = 0.0
    var zc = 0L
    var peak = 0
    var k = 0
    val n = clip.samples.length
    while (k < n) {
      val s = clip.samples(k).toInt
      sumSq += s.toDouble * s
      val a = if (s < 0) -s else s
      if (a > peak) peak = a
      if (k >= ch) {
        val prev = clip.samples(k - ch).toInt
        if (s * prev < 0) zc += 1
      }
      k += 1
    }
    val frames = if (ch == 0) 0L else n.toLong / ch
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    Row(clip.sampleRate, ch, frames,
      frames * 1000L / math.max(clip.sampleRate, 1), rms, zc, peak)
  }

  /** Attach the audio-feature struct to a frame with a binary
    * `payloadCol` — NULL struct where the payload is not decodable
    * PCM WAV (same contract as the image stats). mapPartitions keeps
    * the decode per-executor-batch, no shuffle, no driver. */
  def withAudioFeatures(df: DataFrame, payloadCol: String,
                        out: String = "audio"): DataFrame = {
    val schema = df.schema.add(out, audioFeaturesType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats = if (payload == null) null
          else decodeWav(payload).map(features).orNull
        Row.fromSeq(r.toSeq :+ feats)
      }
    }
  }

  /** 63-bit envelope hash — the audio sibling of
    * [[Multimodal.dHash63]]: per-frame absolute amplitude (channels
    * mixed by mean-of-abs, so stereo phase cancellation can't zero
    * the envelope), 64 equal-rank time windows (integer bounds
    * `[w·frames/64, (w+1)·frames/64)`), fixed-point window means
    * `env(w) = (Σ|s|·4096)/n_w`, one bit per adjacent-window
    * comparison. Loudness DYNAMICS survive gain changes: an exact
    * integer gain k scales every window mean together, preserving
    * all strict comparisons (floor ties can upgrade to strict bits —
    * at 1/4096 resolution ties are rare, so the hash is gain-
    * invariant in practice and exactly so for tie-free envelopes).
    * 63 bits for the same signed-64 portability reason as dHash63.
    * Clips shorter than 64 frames return None. */
  def envHash63(clip: WavClip): Option[Long] = {
    val frames = clip.samples.length / clip.channels
    if (frames < 64) return None
    val ch = clip.channels
    val absMono = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      var s = 0L; var c = 0
      while (c < ch) {
        val v = clip.samples(f * ch + c).toInt
        s += (if (v < 0) -v else v); c += 1
      }
      absMono(f) = s / ch
      f += 1
    }
    val env = new Array[Long](64)
    var w = 0
    while (w < 64) {
      val f0 = w * frames / 64; val f1 = (w + 1) * frames / 64
      var sum = 0L; var i = f0
      while (i < f1) { sum += absMono(i); i += 1 }
      env(w) = sum * 4096 / (f1 - f0)
      w += 1
    }
    var h = 0L
    var i = 0
    while (i < 63) {
      if (env(i + 1) > env(i)) h |= 1L << i
      i += 1
    }
    Some(h)
  }

  /** Attach the envelope hash to a frame with a binary `payloadCol` —
    * NULL where the payload is not decodable PCM WAV or is too short
    * to hash. Per-partition batches like [[withAudioFeatures]]. */
  def withAudioHash(df: DataFrame, payloadCol: String,
                    out: String = "ahash"): DataFrame = {
    val schema = df.schema.add(out, LongType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val h = if (payload == null) null
          else decodeWav(payload).flatMap(envHash63)
            .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }
  }

  /** Closed-form INTEGER triangle wave (period `p` frames, amplitude
    * `a`): s(i) = |((i·4a)/p mod 4a) − 2a| − a, integer division —
    * exactly replayable by the SQL oracle, unlike libm sine. Phase
    * starts at +a (crest), falls through 0 to −a, and back. Note:
    * when p divides 4a the wave passes through EXACT zero at every
    * crossing, and the strict-sign ZCR is legitimately 0 — pick p
    * coprime-ish to 4a for fixtures that should count crossings. */
  def triangleSamples(n: Int, p: Int, a: Int): Array[Short] =
    Array.tabulate(n) { i =>
      val m = (i.toLong * 4 * a / p) % (4L * a)
      (math.abs(m - 2L * a) - a).toShort
    }
}
