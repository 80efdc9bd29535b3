package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.MediaItem

/** G.711 companding contracts (mm30 gates the corpus path): known
  * spec-table values, full-lattice decode/encode idempotence, the WAV
  * router, and the refusal fences. */
class G711Spec extends SparkSpec {

  test("known G.711 table values decode exactly") {
    // µ-law: 0xFF is +0, 0x7F is -0, 0x00 is the negative rail -32124,
    // 0x80 the positive rail +32124 (ITU G.711 Table 2)
    assert(G711.ulawToPcm(0xFF) == 0)
    assert(G711.ulawToPcm(0x7F) == 0)
    assert(G711.ulawToPcm(0x00) == -32124)
    assert(G711.ulawToPcm(0x80) == 32124)
    // A-law: 0x55 decodes to -8, 0xD5 to +8, 0x2A to the negative rail
    // -32256, 0xAA to +32256 (Table 1, 0x55-toggled wire form)
    assert(G711.alawToPcm(0x55) == -8)
    assert(G711.alawToPcm(0xD5) == 8)
    assert(G711.alawToPcm(0x2A) == -32256)
    assert(G711.alawToPcm(0xAA) == 32256)
  }

  test("decode-encode is the identity on the decoded lattice, all 256 codes, both laws") {
    (0 until 256).foreach { b =>
      val u = G711.ulawToPcm(b)
      val ub = G711.pcmToUlaw(u)
      // 0xFF and 0x7F both decode to 0 (±0 collapse) — value-identity
      // is the honest contract, byte-identity holds off the zero pair
      assert(G711.ulawToPcm(ub) == u, s"ulaw byte $b: $u re-encodes to $ub")
      val a = G711.alawToPcm(b)
      val ab = G711.pcmToAlaw(a)
      assert(G711.alawToPcm(ab) == a, s"alaw byte $b: $a re-encodes to $ab")
    }
  }

  test("encoding any 16-bit PCM then decoding lands within its segment's quantization step") {
    var s = -32768
    while (s <= 32767) {
      val du = G711.ulawToPcm(G711.pcmToUlaw(s))
      assert(math.abs(du - s) <= 1024, s"ulaw error at $s: $du") // widest µ segment step/2 = 128<<3
      val da = G711.alawToPcm(G711.pcmToAlaw(s))
      assert(math.abs(da - s) <= 1024, s"alaw error at $s: $da")
      s += 37 // lattice stride keeps the sweep fast but dense
    }
  }

  test("WAV round-trip through the format-tag router, both laws, stereo interleave preserved") {
    val data = Array.tabulate(64)(i => ((i * 11 + 3) % 256).toByte)
    Seq(6, 7).foreach { tag =>
      val wav = G711.encodeWav(tag, 8000, 2, data)
      val dec = G711.decode(MediaItem(tag.toLong, wav))
      assert(dec.sampleRate == 8000 && dec.channels == 2)
      assert(dec.samples.length == 64)
      val expand: Int => Int = if (tag == 7) G711.ulawToPcm else G711.alawToPcm
      assert(dec.samples.toSeq == data.toSeq.map(b => expand(b & 0xff).toShort))
      // the sniffing meta router reaches the same decoder
      val meta = Adpcm.WaveMetaDecoder.decode(MediaItem(tag.toLong, wav))
      assert(meta.height == 2) // channels ride in height per the meta shape
    }
  }

  test("refusals: PCM tag through G711.decode, truncation, data-before-fmt") {
    val data = Array.tabulate(16)(_.toByte)
    val wav = G711.encodeWav(7, 8000, 1, data)
    // flip the format tag to PCM: G711.decode must refuse by name
    val pcm = wav.clone(); pcm(20) = 1
    val e = intercept[IllegalArgumentException] { G711.decode(MediaItem(1L, pcm)) }
    assert(e.getMessage.contains("format tag"), e.getMessage)
    // truncation inside the data chunk
    val e2 = intercept[IllegalArgumentException] {
      G711.decode(MediaItem(2L, wav.take(wav.length - 8)))
    }
    assert(e2.getMessage.contains("overruns") || e2.getMessage.contains("no data"),
      e2.getMessage)
    // a fuzz sweep stays inside the IllegalArgumentException contract
    val rnd = new scala.util.Random(7)
    (0 until 100).foreach { i =>
      val mut = wav.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try { G711.decode(MediaItem(100L + i, mut)); () }
      catch { case _: IllegalArgumentException => () }
    }
  }
}
