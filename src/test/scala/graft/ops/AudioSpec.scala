package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio.{WavClip, decodeWav, encodeWav, features,
  triangleSamples}

/** The RIFF/WAVE PCM path, pinned like the image codecs: exact
  * round-trip, container-walk tolerance (metadata chunks before
  * data), rejection of everything non-PCM-16, feature math against
  * hand-computed values, and byte-level mutation/truncation fuzzing
  * (None or a clip — never an executor-killing throw). */
class AudioSpec extends AnyFunSuite {

  test("encode->decode round-trip is the identity (mono + stereo)") {
    val mono = WavClip(8000, 1, triangleSamples(500, 29, 1200))
    val m = decodeWav(encodeWav(mono)).get
    assert(m.sampleRate == 8000 && m.channels == 1)
    assert(m.samples.sameElements(mono.samples))
    val inter = Array.tabulate[Short](600)(i =>
      (if (i % 2 == 0) i * 3 else -i * 5).toShort)
    val st = WavClip(44100, 2, inter)
    val d = decodeWav(encodeWav(st)).get
    assert(d.sampleRate == 44100 && d.channels == 2)
    assert(d.samples.sameElements(inter))
  }

  test("chunk walk tolerates metadata chunks between fmt and data, " +
      "and word-aligns odd-length chunks") {
    val clip = WavClip(16000, 1, Array[Short](10, -20, 30, -40))
    val base = encodeWav(clip)
    // splice a LIST chunk (odd body length -> pad byte) before data
    val fmtEnd = 12 + 8 + 16
    val listBody = "INFOx".getBytes("US-ASCII") // 5 bytes, odd
    val bb = java.nio.ByteBuffer
      .allocate(base.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, fmtEnd)
    bb.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
    bb.put(listBody).put(0.toByte) // alignment pad
    bb.put(base, fmtEnd, base.length - fmtEnd)
    val d = decodeWav(bb.array()).get
    assert(d.samples.sameElements(clip.samples))
  }

  test("rejects non-PCM / non-16-bit / truncated / alien payloads") {
    val good = encodeWav(WavClip(8000, 1, triangleSamples(64, 13, 300)))
    // flip the codec id to 3 (IEEE float)
    val floatWav = good.clone(); floatWav(20) = 3
    assert(decodeWav(floatWav).isEmpty)
    // flip bits/sample to 8
    val eightBit = good.clone(); eightBit(34) = 8
    assert(decodeWav(eightBit).isEmpty)
    // data chunk claims more bytes than the file carries
    assert(decodeWav(good.take(good.length - 10)).isEmpty)
    assert(decodeWav("ID3not-a-wav-at-all-but-long-enough-yes"
      .getBytes("US-ASCII")).isEmpty)
    assert(decodeWav(null).isEmpty)
  }

  test("feature math matches hand-computed values") {
    // samples: 3, -4, 0, 5 -> sumSq = 9+16+0+25 = 50, rms = sqrt(12.5)
    // strict crossings: 3*-4 < 0 (yes), -4*0 (no), 0*5 (no) -> 1
    val r = features(WavClip(1000, 1, Array[Short](3, -4, 0, 5)))
    assert(r.getInt(0) == 1000 && r.getInt(1) == 1)
    assert(r.getLong(2) == 4 && r.getLong(3) == 4) // 4 frames, 4 ms
    assert(math.abs(r.getDouble(4) - math.sqrt(12.5)) < 1e-12)
    assert(r.getLong(5) == 1 && r.getInt(6) == 5)
    // stereo: crossings count per channel, not across interleave
    // ch0: 7, -7  (1 crossing)   ch1: -2, 2  (1 crossing)
    // interleaved: 7, -2, -7, 2 — adjacent-sample counting would see
    // 7*-2 and -7*2 too (3 total); per-channel must see exactly 2
    val st = features(WavClip(1000, 2, Array[Short](7, -2, -7, 2)))
    assert(st.getLong(5) == 2)
    assert(st.getLong(2) == 2) // frames = samples / channels
  }

  test("envHash63: gain-invariant, dynamics-sensitive, sign bit " +
      "never set, short clips refuse") {
    import Audio.envHash63
    // amplitude-modulated fixture: envelope follows the modulation
    def clip(seed: Int, gain: Int): WavClip = WavClip(16000, 1,
      Array.tabulate[Short](4096) { i =>
        val w = i / 64
        val amp = 150 + (w * w * (17 + 5 * seed)) % 2000
        val m = ((i * 997 % 512) * amp / 512) * gain
        (if (i % 2 == 0) m else -m).toShort
      })
    val h = envHash63(clip(1, 1)).get
    assert(h >= 0, "bit 63 must never be set")
    // exact integer gain preserves every window comparison
    assert(envHash63(clip(1, 3)).get == h)
    // different modulation -> far hash
    val other = envHash63(clip(5, 1)).get
    assert(java.lang.Long.bitCount(other ^ h) > 10)
    // stereo mean-of-abs mix: duplicating the mono channel into both
    // stereo channels is envelope-identical
    val mono = clip(2, 1)
    val stereo = WavClip(16000, 2,
      Array.tabulate[Short](mono.samples.length * 2)(i =>
        mono.samples(i / 2)))
    assert(envHash63(stereo).get == envHash63(mono).get)
    // below 64 frames there is no envelope to hash
    assert(envHash63(WavClip(8000, 1, new Array[Short](63))).isEmpty)
    assert(envHash63(WavClip(8000, 2, new Array[Short](126))).isEmpty)
  }

  test("decoder never throws on adversarial bytes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 11, 43, 44, 45, 128)) {
      val junk = new Array[Byte](n); rnd.nextBytes(junk)
      decodeWav(junk)
    }
    val wav = encodeWav(WavClip(8000, 2, triangleSamples(64, 13, 300)))
    for (i <- wav.indices) {
      val m = wav.clone(); m(i) = (m(i) ^ 0x5a).toByte
      decodeWav(m) // any result is fine; throwing is not
    }
    for (n <- 0 until wav.length)
      decodeWav(java.util.Arrays.copyOf(wav, n))
  }
}
