package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Video.{encodeAvi, parseAvi, sampleVideoFrames}
import graft.SharedSpark

/** The AVI/MJPG container path: encode→parse round-trip, metadata
  * fidelity, stride/cap sampling semantics, the undecodable-frame
  * NULL contract, and adversarial-bytes fuzzing (None / zero rows —
  * never a throw). */
class VideoSpec extends AnyFunSuite {

  private def jpegFrame(w: Int, h: Int, g: Int): Array[Byte] =
    Multimodal.encodeJpeg(Multimodal.PngImage(w, h, 3,
      Array.tabulate(w * h * 3)(i =>
        (if (i % 3 == 1) g else (i / 3 % w) * 255 / (w - 1)).toByte)),
      0.95f)

  test("encode->parse round-trip: frame payloads byte-identical, " +
      "avih metadata intact") {
    val frames = (0 until 5).map(f => jpegFrame(16, 12, 40 + f * 30))
    val avi = encodeAvi(frames, 16, 12, fps = 20)
    val (info, got) = parseAvi(avi).get
    assert(info.width == 16 && info.height == 12)
    assert(info.microSecPerFrame == 50000 && info.declaredFrames == 5)
    assert(got.size == 5)
    got.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
    // odd-length frame payloads must word-align without corruption
    val odd = Array.tabulate[Byte](7)(_.toByte)
    val (_, got2) = parseAvi(encodeAvi(Seq(odd, odd), 4, 4)).get
    assert(got2.size == 2 && got2.forall(_.sameElements(odd)))
  }

  test("sampleVideoFrames: stride + cap; undecodable frames give " +
      "NULL stats; non-AVI payloads give zero rows") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val frames = (0 until 8).map(f => jpegFrame(10, 8, 30 + f * 20))
    val junkFrame = Array.fill[Byte](64)(0x11)
    val docs = Seq(
      (1L, Option(encodeAvi(frames, 10, 8, fps = 10))),
      (2L, Option(encodeAvi(Seq(frames(0), junkFrame), 10, 8))),
      (3L, Option("RIFFnot-really-an-avi-container-xx"
        .getBytes("US-ASCII"))),
      (4L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "payload")
    val strided = sampleVideoFrames(docs, "doc_id", "payload",
      stride = 3, maxFrames = 2)
    val s1 = strided.filter($"doc_id" === 1L)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(s1.toSeq == Seq(0, 3)) // every 3rd, capped at 2 rows
    val all = sampleVideoFrames(docs, "doc_id", "payload").collect()
    assert(all.count(_.getLong(0) == 1L) == 8)
    val d2 = all.filter(_.getLong(0) == 2L).sortBy(_.getInt(1))
    assert(d2.length == 2)
    assert(!d2(0).isNullAt(4) && d2(0).getInt(4) == 10) // real frame
    assert(d2(1).isNullAt(4) && d2(1).isNullAt(7))      // junk frame
    assert(!all.exists(r => r.getLong(0) == 3L || r.getLong(0) == 4L))
  }

  test("parser never throws on adversarial bytes") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 12, 23, 24, 64, 512)) {
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      parseAvi(junk)
    }
    val avi = encodeAvi(Seq(jpegFrame(8, 6, 50)), 8, 6)
    for (i <- avi.indices) {
      val m = avi.clone(); m(i) = (m(i) ^ 0x5a).toByte
      parseAvi(m) // any result is fine; throwing is not
    }
    for (n <- 0 until avi.length)
      parseAvi(java.util.Arrays.copyOf(avi, n))
  }
}
