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
  * needed ([[parseHeader]]). PIXEL decode is REAL for all three:
  * 8-bit non-interlaced gray/RGB(A) PNG ([[decodePng]]: JDK zlib +
  * filter reconstruction), GIF ([[decodeGif]]: pure-JVM LZW +
  * palette), and JPEG ([[decodeJpeg]]: the JDK's own javax.imageio
  * codec) — so resize ([[resizeReal]]) and frame extraction operate
  * on true pixels. Only payloads no decoder recognizes fall back to
  * the clearly-marked deterministic STUBs ([[decodeStub]]) so
  * text-shaped fixtures stay deterministic. Audio (RIFF/WAVE PCM)
  * lives in [[Audio]].
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
        // fill-byte rule (ITU T.81 §B.1.1.2): any number of 0xff pad
        // bytes may precede a marker — skip them, else a padded
        // marker would be misread as marker 0xff with a bogus length
        while (i + 1 < bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
        if (i + 4 > bytes.length) return None
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

  // ---------------- real PNG pixel codec (pure JVM) ----------------
  // zlib (java.util.zip.Inflater/Deflater) ships with the JDK, and
  // PNG's filter reconstruction is integer byte math — so 8-bit
  // non-interlaced gray/RGB(A) PNGs decode to REAL pixels with no
  // codec library. GIF gets the same treatment (pure-JVM LZW below);
  // JPEG's DCT codec comes from the JDK itself (javax.imageio —
  // see decodeJpeg). Only payloads NO decoder recognizes fall back
  // to the documented byte-stride stub.

  /** Decoded raster: row-major `pixels`, `channels` bytes per pixel
    * (1 = gray, 2 = gray+alpha, 3 = RGB, 4 = RGBA), 8 bits each. */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            pixels: Array[Byte])

  private val pngColorToChannels =
    Map(0 -> 1, 2 -> 3, 4 -> 2, 6 -> 4)
  private val pngChannelsToColor = pngColorToChannels.map(_.swap)

  /** Full pixel decode of an 8-bit NON-INTERLACED gray/RGB(A) PNG:
    * chunk walk → IDAT concat → Inflater → per-scanline filter
    * reconstruction (None/Sub/Up/Average/Paeth, RFC 2083 §6). Returns
    * None for anything else (palette, 16-bit, interlaced, truncated,
    * or non-PNG bytes) — callers fall back to the stub, never throw.
    * Dimension product is bounded (64 MPixel) so corrupt headers
    * cannot allocate unbounded buffers inside an executor. */
  def decodePng(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes.length < 45 || !((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')) return None
    var w = 0; var h = 0; var channels = 0
    val idat = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawIhdr = false
    var done = false
    while (!done && i + 8 <= bytes.length) {
      val len = u32be(bytes, i)
      if (len < 0 || i + 12 + len > bytes.length) return None
      val ctype = new String(bytes, i + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = u32be(bytes, i + 8); h = u32be(bytes, i + 12)
          val bitDepth = bytes(i + 16) & 0xff
          val colorType = bytes(i + 17) & 0xff
          val interlace = bytes(i + 20) & 0xff
          if (bitDepth != 8 || interlace != 0 ||
            !pngColorToChannels.contains(colorType)) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          channels = pngColorToChannels(colorType)
          sawIhdr = true
        case "IDAT" => idat.write(bytes, i + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      i += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return None

    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()

    // filter reconstruction; `prior` is the reconstructed previous row
    val out = new Array[Byte](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val filter = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      if (filter > 4) return None
      var x = 0
      while (x < stride) {
        val rawV = raw(rowIn + x) & 0xff
        val a = if (x >= bpp) out(rowOut + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) out(rowOut - stride + x) & 0xff else 0 // up
        val c = if (x >= bpp && y > 0) out(rowOut - stride + x - bpp) & 0xff
          else 0                                                  // up-left
        val recon = filter match {
          case 0 => rawV
          case 1 => rawV + a
          case 2 => rawV + b
          case 3 => rawV + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            rawV + pred
        }
        out(rowOut + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Some(PngImage(w, h, channels, out))
  }

  /** Encode a raster as a real PNG (8-bit, non-interlaced, filter 0
    * per scanline, one IDAT, correct CRCs) — the inverse of
    * [[decodePng]] and the fixture generator for the pixel-oracled
    * queries. */
  def encodePng(img: PngImage): Array[Byte] = {
    require(pngChannelsToColor.contains(img.channels),
      s"unsupported channel count ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer does not match dimensions")
    val stride = img.width * img.channels
    val filtered = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      // filter type 0 (None): fixture images compress fine without
      // per-row filter search, and decode exercises all filter types
      // via round-trip tests on externally-authored variants
      System.arraycopy(img.pixels, y * stride,
        filtered, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zBuf.toByteArray

    val out = java.nio.ByteBuffer.allocate(8 + 25 + (12 + z.length) + 12)
    out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      out.putInt(data.length)
      val start = out.position()
      out.put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(out.array(), start, 4 + data.length)
      out.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
    ihdr.put(8.toByte).put(pngChannelsToColor(img.channels).toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    out.array()
  }

  /** Box-average downsample by `factor`: output dims ceil(in/factor);
    * each output sample is the integer mean (floor) of its
    * factor×factor block, partial blocks at the right/bottom edges
    * averaged over the pixels they actually cover. Pure integer math
    * — an oracle can replay it exactly in SQL. */
  def resizePngBox(img: PngImage, factor: Int): PngImage = {
    require(factor > 0, "factor must be positive")
    val ow = (img.width + factor - 1) / factor
    val oh = (img.height + factor - 1) / factor
    val ch = img.channels
    val out = new Array[Byte](ow * oh * ch)
    var oy = 0
    while (oy < oh) {
      val y0 = oy * factor
      val y1 = math.min(y0 + factor, img.height)
      var ox = 0
      while (ox < ow) {
        val x0 = ox * factor
        val x1 = math.min(x0 + factor, img.width)
        var c = 0
        while (c < ch) {
          var sum = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += img.pixels((y * img.width + x) * ch + c) & 0xff
              x += 1
            }
            y += 1
          }
          out((oy * ow + ox) * ch + c) =
            (sum / ((y1 - y0) * (x1 - x0))).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    PngImage(ow, oh, ch, out)
  }

  // ---------------- real GIF pixel codec (pure JVM) ----------------
  // GIF's LZW is plain bit-twiddling — no codec library needed either.
  // decodeGif returns the FIRST frame as an RGB raster (palette
  // resolved); animations' later frames and transparency compositing
  // are out of scope (the first-frame raster is what resize/stats
  // pipelines consume).

  /** LZW decompression, GIF variant (LSB-first packing, CLEAR/EOI
    * codes, max 12-bit codes). Returns exactly `nPixels` index bytes
    * or None on any malformed stream. */
  private def gifLzwDecode(minCodeSize: Int, data: Array[Byte],
                           nPixels: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val out = new Array[Byte](nPixels)
    var outPos = 0
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var codeSize = minCodeSize + 1
    var next = eoi + 1
    var prev = -1
    var prevFirst: Byte = 0
    var bitPos = 0
    val totalBits = data.length * 8
    while (outPos < nPixels) {
      if (bitPos + codeSize > totalBits) return None
      var code = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if (((data(p >> 3) >> (p & 7)) & 1) != 0) code |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (code == eoi) return None // early EOI: fewer pixels than raster
      else if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else {
        var sp = 0
        var c = code
        if (c >= next) {
          // the KwK case: only code == next with a live prefix is legal
          if (c != next || prev < 0) return None
          stack(sp) = prevFirst; sp += 1; c = prev
        }
        while (c > eoi) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= clear) return None
        val first = c.toByte
        stack(sp) = first; sp += 1
        if (outPos + sp > nPixels) return None
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code; prevFirst = first
      }
    }
    Some(out)
  }

  /** Full pixel decode of a GIF's FIRST image: logical screen +
    * global/local color table + LZW + interlace reconstruction.
    * Output is an RGB [[PngImage]] raster (3 channels, palette
    * resolved). None for malformed/truncated bytes — callers fall
    * back to the stub, never throw. */
  def decodeGif(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes.length < 14 || bytes(0) != 'G' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != '8' ||
      !(bytes(4) == '7' || bytes(4) == '9') || bytes(5) != 'a') return None
    var i = 6
    i += 4 // logical screen w/h (frames carry their own dims)
    val packed = bytes(i) & 0xff; i += 3 // packed, bg index, aspect
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
      i += 3 * n
    }
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < bytes.length && bytes(i) != 0) i += 1 + (bytes(i) & 0xff)
          i += 1
        case 0x2c => // image descriptor
          if (i + 10 > bytes.length) return None
          val w = u16le(bytes, i + 5)
          val h = u16le(bytes, i + 7)
          val ip = bytes(i + 9) & 0xff
          i += 10
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          val interlaced = (ip & 0x40) != 0
          var palette = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (i + 3 * n > bytes.length) return None
            palette = java.util.Arrays.copyOfRange(bytes, i, i + 3 * n)
            i += 3 * n
          }
          if (palette == null) return None
          if (i >= bytes.length) return None
          val minCode = bytes(i) & 0xff; i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < bytes.length && bytes(i) != 0) {
            val len = bytes(i) & 0xff
            if (i + 1 + len > bytes.length) return None
            data.write(bytes, i + 1, len)
            i += 1 + len
          }
          val indices = gifLzwDecode(minCode, data.toByteArray, w * h)
            .getOrElse(return None)
          val nColors = palette.length / 3
          val px = new Array[Byte](w * h * 3)
          // interlace: pass row origins/strides per the GIF89a spec
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else Array.concat(
              Array.range(0, h, 8), Array.range(4, h, 8),
              Array.range(2, h, 4), Array.range(1, h, 2))
          var srcRow = 0
          while (srcRow < h) {
            val dstRow = rowOrder(srcRow)
            var x = 0
            while (x < w) {
              val idx = indices(srcRow * w + x) & 0xff
              if (idx >= nColors) return None
              System.arraycopy(palette, idx * 3, px, (dstRow * w + x) * 3, 3)
              x += 1
            }
            srcRow += 1
          }
          return Some(PngImage(w, h, 3, px))
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** Encode an INDEXED raster as a real GIF89a (256-entry global
    * color table, non-interlaced, valid LZW stream) — the fixture
    * generator twin of [[decodeGif]]. The LZW stream uses the
    * clear-before-every-literal form: spec-legal, dictionary never
    * grows, any conforming decoder reads it (2× the bits of real
    * compression — irrelevant for fixtures). `palette` is n×3 RGB
    * (n ≤ 256); `indices` row-major. */
  def encodeGif(width: Int, height: Int, palette: Array[Array[Int]],
                indices: Array[Byte]): Array[Byte] = {
    require(palette.nonEmpty && palette.length <= 256, "palette size")
    require(indices.length == width * height, "indices != w*h")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0xf7); out.write(0); out.write(0) // GCT 256, bg, aspect
    var ci = 0
    while (ci < 256) {
      val c = if (ci < palette.length) palette(ci) else Array(0, 0, 0)
      out.write(c(0) & 0xff); out.write(c(1) & 0xff); out.write(c(2) & 0xff)
      ci += 1
    }
    out.write(0x2c) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(width & 0xff); out.write(width >> 8)
    out.write(height & 0xff); out.write(height >> 8)
    out.write(0) // no LCT, not interlaced
    val minCode = 8
    out.write(minCode)
    // bit-pack [clear, literal]* + EOI at 9 bits LSB-first
    val clear = 1 << minCode; val eoi = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += 9
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    var pi = 0
    while (pi < indices.length) {
      put(clear); put(indices(pi) & 0xff); pi += 1
    }
    put(eoi)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val lzw = bits.toByteArray
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // JPEG's DCT entropy decode is NOT hand-rolled like PNG/GIF — the
  // JDK ships a full baseline+progressive JPEG codec in java.desktop
  // (javax.imageio; headless-safe, no external library), the same
  // reader the PNG/GIF specs already trust as their cross-check
  // oracle. Disk caching off: ImageIO otherwise spools every decode
  // through an executor temp file.
  private lazy val imageIoReady: Boolean = {
    try { javax.imageio.ImageIO.setUseCache(false); true }
    catch { case _: Throwable => false }
  }

  /** Real JPEG pixel decode via the JDK's own codec (javax.imageio).
    * Gray JPEGs decode to 1 channel, everything else lands as RGB
    * (3 channels, sRGB — CMYK/YCCK variants the reader can't convert
    * return None). Same contract as [[decodePng]]/[[decodeGif]]:
    * None on truncated/header-only/corrupt/oversized input — callers
    * fall back to the stub, never throw. */
  def decodeJpeg(bytes: Array[Byte]): Option[PngImage] = {
    if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8 ||
        !imageIoReady) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      // same 64 MPixel executor-allocation bound as decodePng
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      val gray = img.getColorModel.getNumComponents == 1
      if (gray) {
        val out = new Array[Byte](w * h)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1
          }
          y += 1
        }
        Some(PngImage(w, h, 1, out))
      } else {
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < argb.length) {
          val p = argb(i)
          out(i * 3) = ((p >> 16) & 0xff).toByte
          out(i * 3 + 1) = ((p >> 8) & 0xff).toByte
          out(i * 3 + 2) = (p & 0xff).toByte
          i += 1
        }
        Some(PngImage(w, h, 3, out))
      }
    } catch { case _: Throwable => None }
  }

  /** Real JPEG encode via the JDK codec (gray or RGB only — JPEG has
    * no alpha). `quality` ∈ (0, 1]; used by the specs to build
    * genuine lossy payloads for the decode path. */
  def encodeJpeg(img: PngImage, quality: Float = 0.95f): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"JPEG supports gray or RGB, got ${img.channels} channels")
    val btype =
      if (img.channels == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val bi = new java.awt.image.BufferedImage(img.width, img.height, btype)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val base = (y * img.width + x) * img.channels
        if (img.channels == 1)
          // raster samples, NOT setRGB: setRGB on TYPE_BYTE_GRAY
          // routes through an sRGB→linear-gray color conversion that
          // silently rewrites the sample values (measured: 40 → 5)
          bi.getRaster.setSample(x, y, 0, img.pixels(base) & 0xff)
        else
          bi.setRGB(x, y,
            ((img.pixels(base) & 0xff) << 16) |
              ((img.pixels(base + 1) & 0xff) << 8) |
              (img.pixels(base + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Pixel decode dispatch — all three container formats are real:
    * PNG and GIF via the pure-JVM codecs above, JPEG via the JDK's
    * built-in javax.imageio reader. None only for genuinely
    * undecodable payloads (unknown container, corrupt stream). */
  def decodeImage(bytes: Array[Byte]): Option[PngImage] =
    decodePng(bytes).orElse(decodeGif(bytes)).orElse(decodeJpeg(bytes))

  /** 63-bit difference hash (dHash) over REAL decoded pixels — the
    * perceptual fingerprint behind image near-dup detection: luma
    * (ITU-R 601 integer weights, 299/587/114 ‰) → 9×8 grid of
    * box-mean cells (integer bounds `[b·dim/grid, (b+1)·dim/grid)`,
    * integer mean) → one bit per horizontally-adjacent cell
    * comparison. Brightness/contrast shifts that move all cells
    * together cancel; crops/recompressions flip only a few bits.
    *
    * 63 bits, not 64: the final comparison (grid position 7,7) is
    * dropped so the packed hash never sets the sign bit — keeping
    * every engine's signed-64 arithmetic (including the DuckDB
    * oracle, which errors on `1::BIGINT << 63`) portable. The lost
    * discrimination is one bit in 64.
    *
    * Images smaller than the grid (w < 9 or h < 8) return None —
    * there is no meaningful 9×8 structure to hash. */
  def dHash63(img: PngImage): Option[Long] = {
    val gw = 9; val gh = 8
    if (img.width < gw || img.height < gh) return None
    def luma(p: Int): Int = img.channels match {
      case 1 | 2 => img.pixels(p * img.channels) & 0xff
      case _ =>
        val base = p * img.channels
        (299 * (img.pixels(base) & 0xff) +
          587 * (img.pixels(base + 1) & 0xff) +
          114 * (img.pixels(base + 2) & 0xff)) / 1000
    }
    val cells = Array.ofDim[Long](gh, gw)
    var by = 0
    while (by < gh) {
      val y0 = by * img.height / gh; val y1 = (by + 1) * img.height / gh
      var bx = 0
      while (bx < gw) {
        val x0 = bx * img.width / gw; val x1 = (bx + 1) * img.width / gw
        var sum = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += luma(y * img.width + x); n += 1; x += 1 }
          y += 1
        }
        cells(by)(bx) = sum / n
        bx += 1
      }
      by += 1
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val idx = y * 8 + x
        if (idx < 63 && cells(y)(x + 1) > cells(y)(x)) h |= 1L << idx
        x += 1
      }
      y += 1
    }
    Some(h)
  }

  /** Attach the perceptual hash to a frame with a binary
    * `payloadCol` — NULL where the payload doesn't decode (or is too
    * small to hash). Same mapPartitions batch shape as the other
    * decoders: per-executor, no shuffle, no driver. */
  def withImageHash(df: DataFrame, payloadCol: String,
                    out: String = "phash"): DataFrame = {
    val schema = df.schema.add(out, LongType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val h = if (payload == null) null
          else decodeImage(payload).flatMap(dHash63)
            .map(java.lang.Long.valueOf).orNull
        Row.fromSeq(r.toSeq :+ h)
      }
    }
  }

  /** REAL resize where the payload is a decodable PNG, GIF or JPEG
    * (decode → box-average → re-encode as PNG — resized outputs are
    * always PNG); the documented byte-stride stub only for payloads
    * no decoder recognizes. */
  def resizeReal(bytes: Array[Byte], factor: Int): Array[Byte] =
    decodeImage(bytes) match {
      case Some(img) => encodePng(resizePngBox(img, factor))
      case None => resizeStub(bytes, factor)
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
    * batches, like [[withDecodedMeta]]): REAL pixel resize for
    * decodable PNG/GIF/JPEG payloads, the byte-stride stub otherwise
    * (see [[resizeReal]]). */
  def withResized(df: DataFrame, payloadCol: String, factor: Int,
                  out: String = "resized"): DataFrame = {
    val schema = df.schema.add(out, BinaryType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val resized = if (payload == null) null else resizeReal(payload, factor)
        Row.fromSeq(r.toSeq :+ resized)
      }
    }
  }

  private val pngStatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixel_sum", LongType, nullable = false),
    StructField("n_values", LongType, nullable = false)))

  /** Decode `payloadCol` (PNG or GIF — [[decodeImage]]) and attach
    * real pixel statistics (dims, channel count, byte-value sum,
    * value count) — NULL struct where the payload is not decodable.
    * The exact-integer stats let a SQL oracle replay the whole codec
    * path (encode → compress → decompress → reconstruct → stats)
    * analytically. */
  def withPngStats(df: DataFrame, payloadCol: String,
                   out: String = "png_stats"): DataFrame = {
    val schema = df.schema.add(out, pngStatsType, nullable = true)
    val idx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val stats = if (payload == null) null else decodeImage(payload) match {
          case Some(img) =>
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xff; i += 1 }
            Row(img.width, img.height, img.channels, sum,
              img.pixels.length.toLong)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ stats)
      }
    }
  }

  /** Split a video-shaped payload — back-to-back concatenated PNGs —
    * into frames at the 8-byte PNG signatures, decode every frame,
    * and emit one row per frame with REAL pixel stats: (idCol,
    * frame_idx, width, height, channels, pixel_sum). Frames that fail
    * to decode yield NULL stats (kept: a corrupt frame should surface,
    * not vanish). Per-partition like the other multimodal stages. */
  def sampleFramesPng(df: DataFrame, idCol: String,
                      payloadCol: String): DataFrame = {
    val sigHead = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("pixel_sum", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val pIdx = df.schema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) Iterator.empty
        else {
          val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
          var i = 0
          while (i + sigHead.length <= payload.length) {
            var m = 0
            while (m < sigHead.length && payload(i + m) == sigHead(m)) m += 1
            if (m == sigHead.length) { starts += i; i += sigHead.length }
            else i += 1
          }
          starts.toSeq.zipWithIndex.iterator.map { case (s, idx) =>
            val end = if (idx + 1 < starts.length) starts(idx + 1)
              else payload.length
            decodePng(java.util.Arrays.copyOfRange(payload, s, end)) match {
              case Some(img) =>
                var sum = 0L
                var j = 0
                while (j < img.pixels.length) {
                  sum += img.pixels(j) & 0xff; j += 1
                }
                Row(r.get(idIdx), idx, img.width, img.height, img.channels,
                  sum)
              case None => Row(r.get(idIdx), idx, null, null, null, null)
            }
          }
        }
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
