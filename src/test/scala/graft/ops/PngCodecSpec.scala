package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.{PngImage, decodePng, encodePng, resizePngBox,
  resizeReal, resizeStub, parseHeader, sampleFramesPng}
import graft.SharedSpark

/** The pure-JVM PNG pixel codec, pinned three ways:
  *
  *  1. round-trip: encodePng → decodePng is the identity on pixels;
  *  2. filter coverage: hand-filtered scanlines (Sub/Up/Average/
  *     Paeth) reconstruct to the known raster;
  *  3. cross-implementation: javax.imageio (the JDK's independent
  *     PNG codec, which WRITES adaptive filters) reads our output
  *     pixel-for-pixel and our decoder reads ITS output — so the
  *     decoder is validated against an implementation that exercises
  *     the filter paths our encoder deliberately doesn't emit.
  */
class PngCodecSpec extends AnyFunSuite {

  private def mkImage(w: Int, h: Int, ch: Int, seed: Int): PngImage = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = ((x * 31 + y * 17 + seed * 7 + c * 5) % 256).toByte
    PngImage(w, h, ch, px)
  }

  test("encode->decode round-trip is the identity (gray/GA/RGB/RGBA)") {
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9))) {
      val img = mkImage(w, h, ch, ch + w)
      val back = decodePng(encodePng(img)).getOrElse(
        fail(s"decode failed for ch=$ch ${w}x$h"))
      assert(back.width == w && back.height == h && back.channels == ch)
      assert(back.pixels.sameElements(img.pixels), s"pixels ch=$ch ${w}x$h")
    }
  }

  test("all five scanline filters reconstruct correctly") {
    // build the PNG by hand so each row uses a CHOSEN filter type —
    // our encoder only emits filter 0, so this is the only way to pin
    // Sub/Up/Average/Paeth reconstruction deterministically
    val img = mkImage(6, 5, 3, seed = 9)
    val stride = img.width * img.channels
    val bpp = img.channels
    val filters = Array(0, 1, 2, 3, 4) // one per row
    val filtered = new Array[Byte]((stride + 1) * img.height)
    for (y <- 0 until img.height) {
      val f = filters(y)
      filtered(y * (stride + 1)) = f.toByte
      for (i <- 0 until stride) {
        val cur = img.pixels(y * stride + i) & 0xff
        val a = if (i >= bpp) img.pixels(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) img.pixels((y - 1) * stride + i) & 0xff else 0
        val c = if (i >= bpp && y > 0)
          img.pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val predicted = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(y * (stride + 1) + 1 + i) = (cur - predicted).toByte
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filtered); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val z = zOut.toByteArray
    val buf = java.nio.ByteBuffer.allocate(8 + 25 + 12 + z.length + 12)
    buf.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      buf.putInt(data.length)
      val start = buf.position()
      buf.put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(buf.array(), start, 4 + data.length)
      buf.putInt(crc.getValue.toInt)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array()); chunk("IDAT", z)
    chunk("IEND", Array.emptyByteArray)
    val back = decodePng(buf.array()).getOrElse(fail("decode failed"))
    assert(back.pixels.sameElements(img.pixels),
      "hand-filtered scanlines must reconstruct to the original raster")
  }

  test("cross-check vs javax.imageio in both directions (RGB + RGBA)") {
    import java.awt.image.BufferedImage
    for (ch <- Seq(3, 4)) {
      val img = mkImage(21, 13, ch, seed = 4)
      // ours -> ImageIO
      val read = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(encodePng(img)))
      assert(read.getWidth == img.width && read.getHeight == img.height)
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val argb = read.getRGB(x, y)
        val base = (y * img.width + x) * ch
        assert(((argb >> 16) & 0xff) == (img.pixels(base) & 0xff), s"R($x,$y)")
        assert(((argb >> 8) & 0xff) == (img.pixels(base + 1) & 0xff), s"G($x,$y)")
        assert((argb & 0xff) == (img.pixels(base + 2) & 0xff), s"B($x,$y)")
        if (ch == 4)
          assert(((argb >> 24) & 0xff) == (img.pixels(base + 3) & 0xff),
            s"A($x,$y)")
      }
      // ImageIO (adaptive filters!) -> ours
      val bi = new BufferedImage(img.width, img.height,
        if (ch == 4) BufferedImage.TYPE_INT_ARGB else BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.height; x <- 0 until img.width) {
        val base = (y * img.width + x) * ch
        val a = if (ch == 4) img.pixels(base + 3) & 0xff else 0xff
        bi.setRGB(x, y, (a << 24) | ((img.pixels(base) & 0xff) << 16) |
          ((img.pixels(base + 1) & 0xff) << 8) | (img.pixels(base + 2) & 0xff))
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", out))
      val ours = decodePng(out.toByteArray).getOrElse(
        fail("our decoder rejected an ImageIO-written PNG"))
      assert(ours.width == img.width && ours.height == img.height)
      assert(ours.channels == ch,
        s"expected $ch channels, got ${ours.channels}")
      assert(ours.pixels.sameElements(img.pixels),
        s"pixel mismatch decoding ImageIO output (ch=$ch)")
    }
  }

  test("box resize: exact integer means incl. partial edge blocks") {
    // 5x3 gray, factor 2 -> 3x2; right column and bottom row cover
    // partial blocks
    val px = Array.tabulate(15)(i => (i * 10).toByte) // 0,10,...,140
    val img = PngImage(5, 3, 1, px)
    val small = resizePngBox(img, 2)
    assert(small.width == 3 && small.height == 2)
    // row-major input values:
    //   0  10  20  30  40
    //  50  60  70  80  90
    // 100 110 120 130 140
    // block (0,0): {0,10,50,60} -> 30; (1,0): {20,30,70,80} -> 50
    // (2,0): {40,90} -> 65; (0,1): {100,110} -> 105
    // (1,1): {120,130} -> 125; (2,1): {140} -> 140
    assert(small.pixels.map(_ & 0xff).toSeq == Seq(30, 50, 65, 105, 125, 140))
  }

  test("resizeReal: PNG decodes+resizes; non-PNG falls back to stub") {
    val img = mkImage(8, 8, 3, seed = 1)
    val resized = resizeReal(encodePng(img), 2)
    val back = decodePng(resized).getOrElse(fail("resized not a PNG"))
    assert(back.width == 4 && back.height == 4 && back.channels == 3)
    val text = "not a png at all, just text".getBytes("UTF-8")
    assert(resizeReal(text, 4).sameElements(resizeStub(text, 4)))
  }

  test("decodePng rejects what it must (palette/16-bit/interlace/junk)") {
    assert(decodePng("junk".getBytes).isEmpty)
    assert(decodePng(Multimodal.pngHeader(4, 4)).isEmpty) // header, no IDAT
    // flip IHDR fields of a valid file and expect rejection
    val good = encodePng(mkImage(4, 4, 3, 0))
    def mutated(off: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(off) = v; b
    }
    assert(decodePng(mutated(24, 16)).isEmpty, "16-bit depth")
    assert(decodePng(mutated(25, 3)).isEmpty, "palette color type")
    assert(decodePng(mutated(28, 1)).isEmpty, "interlaced")
  }

  test("JPEG header parse skips fill bytes before markers") {
    // standards-legal padding: 0xff fill bytes between segments
    val base = Multimodal.jpegHeader(800, 600)
    val padded = new java.io.ByteArrayOutputStream()
    padded.write(base, 0, 2)              // SOI
    padded.write(0xff); padded.write(0xff) // fill bytes, then APP0 ff e0...
    padded.write(base, 3, base.length - 3) // rest (skip base's own 0xff)
    assert(parseHeader(padded.toByteArray).contains(("jpeg", 800, 600)),
      "fill bytes before a marker must not derail the segment walk")
  }

  test("GIF encode->decode round-trip resolves the palette exactly") {
    val (w, h) = (11, 7)
    val palette = Array.tabulate(256)(i =>
      Array(i, (i * 2) % 256, (255 - i)))
    val indices = Array.tabulate(w * h)(i => ((i * 37 + 5) % 256).toByte)
    val gif = Multimodal.encodeGif(w, h, palette, indices)
    val img = Multimodal.decodeGif(gif).getOrElse(fail("decodeGif failed"))
    assert(img.width == w && img.height == h && img.channels == 3)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert((img.pixels(i * 3 + c) & 0xff) == palette(indices(i) & 0xff)(c),
        s"pixel $i channel $c")
  }

  test("GIF cross-check vs javax.imageio in both directions") {
    import java.awt.image.BufferedImage
    // ImageIO -> ours: ImageIO's GIF writer emits REAL LZW compression
    // (and often interlace/extension blocks), which pins the LZW
    // decoder against an independent implementation
    val (w, h) = (19, 12)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 20) % 256 << 16) | ((y * 30) % 256 << 8) | 128)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", out))
    val ours = Multimodal.decodeGif(out.toByteArray)
      .getOrElse(fail("our decoder rejected an ImageIO-written GIF"))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = bi.getRGB(x, y) // palette-quantized by TYPE_BYTE_INDEXED
      val base = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (ours.pixels(base) & 0xff), s"R($x,$y)")
      assert(((argb >> 8) & 0xff) == (ours.pixels(base + 1) & 0xff), s"G($x,$y)")
      assert((argb & 0xff) == (ours.pixels(base + 2) & 0xff), s"B($x,$y)")
    }
    // ours -> ImageIO
    val palette = Array.tabulate(256)(i => Array(i, i, i))
    val indices = Array.tabulate(w * h)(i => (i % 256).toByte)
    val read = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.encodeGif(w, h, palette, indices)))
    assert(read.getWidth == w && read.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val expect = (y * w + x) % 256
      assert((read.getRGB(x, y) & 0xff) == expect, s"ImageIO read ($x,$y)")
    }
  }

  test("resizeReal resizes decodable GIFs to PNG output; headers-only " +
      "GIF falls back to the stub") {
    val palette = Array.tabulate(256)(i => Array(i, i, i))
    val indices = Array.tabulate(8 * 6)(i => (i * 4 % 256).toByte)
    val gif = Multimodal.encodeGif(8, 6, palette, indices)
    val resized = Multimodal.resizeReal(gif, 2)
    val back = Multimodal.decodePng(resized)
      .getOrElse(fail("GIF resize should emit a PNG"))
    assert(back.width == 4 && back.height == 3 && back.channels == 3)
    // dimension-only GIF header (no image data): stub path
    val hdr = Multimodal.gifHeader(12, 34)
    assert(Multimodal.decodeGif(hdr).isEmpty)
    assert(Multimodal.resizeReal(hdr, 4)
      .sameElements(Multimodal.resizeStub(hdr, 4)))
  }

  test("decoders never throw on adversarial bytes — None, not an " +
      "executor-killing exception") {
    val rnd = new scala.util.Random(42)
    // pure random garbage of assorted sizes
    for (n <- Seq(0, 1, 7, 13, 33, 64, 256, 4096)) {
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      Multimodal.decodeImage(junk) // must not throw
      Multimodal.parseHeader(junk)
    }
    // valid files with every single byte position mutated — CRCs,
    // lengths, filter types, LZW codes, palette sizes all get hit
    val png = encodePng(mkImage(6, 5, 3, 2))
    val gif = Multimodal.encodeGif(6, 5,
      Array.tabulate(256)(i => Array(i, i, i)),
      Array.tabulate(30)(_.toByte))
    for (base <- Seq(png, gif); i <- base.indices) {
      val m = base.clone()
      m(i) = (m(i) ^ 0x5a).toByte
      Multimodal.decodeImage(m) // any result is fine; throwing is not
    }
    // truncations at every prefix length
    for (base <- Seq(png, gif); n <- 0 until base.length) {
      Multimodal.decodeImage(java.util.Arrays.copyOf(base, n))
    }
  }

  test("JPEG: encode->decode round-trip via the JDK codec is " +
      "tolerance-exact (lossy), dimension-exact, channel-exact") {
    import Multimodal.{decodeJpeg, encodeJpeg}
    // solid color: every 8x8 block is DC-only, so high-quality decode
    // lands within quantization rounding of the original
    val solid = PngImage(32, 24, 3,
      Array.fill(32 * 24 * 3)(0: Byte).zipWithIndex.map { case (_, i) =>
        (i % 3 match { case 0 => 120; case 1 => 64; case _ => 200 }).toByte
      })
    val dec = decodeJpeg(encodeJpeg(solid, 1.0f)).get
    assert((dec.width, dec.height, dec.channels) == (32, 24, 3))
    val maxErr = dec.pixels.indices.map(i =>
      math.abs((dec.pixels(i) & 0xff) - (solid.pixels(i) & 0xff))).max
    assert(maxErr <= 3, s"solid-color decode drifted by $maxErr")
    // SMOOTH gradient: the mean must survive the DCT round-trip
    // closely. (mkImage's sawtooth is deliberately NOT used here:
    // ±93/pixel channel swings alias under 4:2:0 chroma subsampling
    // and clip in YCbCr — a real JPEG artifact, not a codec bug.)
    val gw = 40; val gh = 26
    val gpx = new Array[Byte](gw * gh * 3)
    for (y <- 0 until gh; x <- 0 until gw) {
      val base = (y * gw + x) * 3
      gpx(base) = (x * 255 / (gw - 1)).toByte
      gpx(base + 1) = (y * 255 / (gh - 1)).toByte
      gpx(base + 2) = 96.toByte
    }
    val grad = PngImage(gw, gh, 3, gpx)
    val gd = decodeJpeg(encodeJpeg(grad, 0.95f)).get
    def mean(p: Array[Byte]) = p.map(_ & 0xff).sum.toDouble / p.length
    assert(math.abs(mean(gd.pixels) - mean(grad.pixels)) < 2.0,
      s"mean drifted: ${mean(gd.pixels)} vs ${mean(grad.pixels)}")
    // grayscale path keeps 1 channel (smooth ramp here too — the
    // sawtooth's mod-256 wraps ring and clip even luma-only)
    val gray = PngImage(17, 9, 1,
      Array.tabulate(17 * 9)(i => (40 + (i % 17) * 10).toByte))
    val gy = decodeJpeg(encodeJpeg(gray, 1.0f)).get
    assert((gy.width, gy.height, gy.channels) == (17, 9, 1))
    assert(math.abs(mean(gy.pixels) - mean(gray.pixels)) < 2.0)
  }

  test("JPEG: header-only payloads still stub (the multimodal_resize " +
      "oracle depends on it); resizeReal resizes real JPEGs to PNG") {
    import Multimodal.{decodeJpeg, encodeJpeg}
    // doc 100 in multimodal_resize: SOF present, no scan data — the
    // decoder must return None so the byte-stride stub keeps serving
    // the oracled fallback row
    assert(decodeJpeg(Multimodal.jpegHeader(800, 600)).isEmpty)
    assert(decodeJpeg(Multimodal.jpegHeader(64, 64, progressive = true)).isEmpty)
    // a REAL JPEG now takes the decode → box-resize → PNG path
    val img = mkImage(20, 14, 3, 8)
    val resized = resizeReal(encodeJpeg(img, 1.0f), 2)
    val out = decodePng(resized).get
    assert((out.width, out.height, out.channels) == (10, 7, 3))
    // fuzz: mutate/truncate a real JPEG everywhere — None or pixels,
    // never a throw (same contract as the PNG/GIF decoders)
    val jpeg = encodeJpeg(mkImage(9, 7, 3, 1), 0.9f)
    for (i <- jpeg.indices) {
      val m = jpeg.clone(); m(i) = (m(i) ^ 0x5a).toByte
      Multimodal.decodeImage(m)
    }
    for (n <- 0 until jpeg.length)
      Multimodal.decodeImage(java.util.Arrays.copyOf(jpeg, n))
  }

  test("dHash63: brightness-shift invariant, local-edit sensitive, " +
      "sign bit never set, tiny images refuse") {
    import Multimodal.dHash63
    // values bounded at 179 so the +40 brightness shift below never
    // clips — clipping is a NON-uniform edit and legitimately moves
    // the hash; the invariance claim is for pure shifts
    val base = PngImage(36, 32, 3, Array.tabulate(36 * 32 * 3) { i =>
      val c = i % 3; val p = i / 3
      ((p % 36 * 31 + p / 36 * 17 + c * 5) % 180).toByte
    })
    val h = dHash63(base).get
    assert(h >= 0, "bit 63 must never be set (signed-64 portability)")
    // +40 uniform brightness — all cells shift together, every
    // comparison is preserved: THE dHash invariance
    val bright = PngImage(36, 32, 3, base.pixels.map(b =>
      ((b & 0xff) + 40).toByte))
    assert(dHash63(bright).get == h)
    // a localized patch edit flips some bits but nowhere near all
    val edited = PngImage(36, 32, 3, base.pixels.clone())
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      edited.pixels((y * 36 + x) * 3 + c) = 255.toByte
    val d = java.lang.Long.bitCount(dHash63(edited).get ^ h)
    assert(d > 0 && d < 20, s"patch edit flipped $d bits")
    // gray path uses the single channel directly
    assert(dHash63(mkImage(18, 16, 1, 2)).isDefined)
    // below the 9x8 grid there is nothing to hash
    assert(dHash63(mkImage(8, 8, 3, 1)).isEmpty)
    assert(dHash63(mkImage(9, 7, 3, 1)).isEmpty)
    // full path: JPEG recompression of the SAME image stays within a
    // few bits of the lossless original (the near-dup premise)
    val jpegBytes = Multimodal.encodeJpeg(base, 0.95f)
    val viaJpeg = Multimodal.decodeImage(jpegBytes).flatMap(dHash63).get
    assert(java.lang.Long.bitCount(viaJpeg ^ h) <= 6,
      s"JPEG recompression moved ${java.lang.Long.bitCount(viaJpeg ^ h)} bits")
  }

  test("sampleFramesPng splits concatenated PNGs and decodes each") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val frames = Seq(mkImage(4, 3, 1, 0), mkImage(6, 2, 3, 1),
      mkImage(2, 2, 4, 2))
    val payload = frames.map(encodePng).reduce(_ ++ _)
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val out = sampleFramesPng(df, "doc_id", "payload")
      .orderBy("frame_idx").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getInt(2), r.getInt(3), r.getInt(4))).toSeq ==
      Seq((4, 3, 1), (6, 2, 3), (2, 2, 4)))
    val expectedSums = frames.map(f =>
      f.pixels.map(_ & 0xff).map(_.toLong).sum)
    assert(out.map(_.getLong(5)).toSeq == expectedSums)
  }
}
