package graft.ops

import graft.SparkSpec
import Multimodal.MediaItem

/** Contracts of the real FLAC sample decode: lossless round-trips for
  * every supported subframe type (CONSTANT, VERBATIM, FIXED orders
  * 0-4) across multiple frames and Rice partitions, CRC enforcement
  * (a flipped bit refuses, never returns wrong samples), and the
  * instructive LPC refusal. */
class FlacPcmSpec extends SparkSpec {

  private def saw(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i =>
      (((seed * 31 + i * 57 + i.toLong * i * (1 + seed % 89)) % 4096) - 2048).toInt)

  test("lossless round-trip: every fixed order, verbatim, multi-frame, " +
      "partitioned residuals") {
    val s = saw(256, 7L)
    (0 to 4).foreach { o =>
      val bytes = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
        orderFor = _ => o, partitionOrder = 1)
      assert(FlacPcm.decode(MediaItem(o.toLong, bytes)).toSeq == s.toSeq,
        s"fixed order $o")
    }
    val verb = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => -1)
    assert(FlacPcm.decode(MediaItem(9L, verb)).toSeq == s.toSeq)
    // mixed per-frame subframe types in one stream
    val mixed = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = f => if (f % 2 == 0) f % 5 else -1, partitionOrder = 1)
    assert(FlacPcm.decode(MediaItem(10L, mixed)).toSeq == s.toSeq)
  }

  test("constant subframe and a non-multiple tail frame round-trip") {
    val s = Array.fill(96)(-123)
    val bytes = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => -2)
    assert(FlacPcm.decode(MediaItem(1L, bytes)).toSeq == s.toSeq)
    val tail = saw(100, 3L) // 64 + 36: short last frame
    val b2 = FlacPcm.FlacPcmEncoder.encode(tail, 8000, blockSize = 64,
      orderFor = _ => 2, partitionOrder = 1)
    assert(FlacPcm.decode(MediaItem(2L, b2)).toSeq == tail.toSeq)
  }

  test("CRC enforcement: a flipped frame byte refuses, never returns " +
      "wrong samples") {
    val s = saw(128, 11L)
    val base = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => 2)
    // flip one byte in the back half (frame data, past the metadata)
    val idx = base.length - 10
    val bad = base.clone(); bad(idx) = (bad(idx) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(3L, bad)): Unit
    }
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("FLAC") ||
      e.getMessage.contains("media"), e.getMessage)
  }

  test("a retyped subframe byte and truncation refuse, never return " +
      "wrong samples") {
    val s = saw(64, 5L)
    val base = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => 0)
    // subframe type byte sits at a fixed offset in the fixture:
    // 42 bytes of container metadata + 7 frame-header bytes. Retyping
    // the FIXED-0 subframe as LPC order 1 now DECODES as LPC (r13) —
    // but reinterprets the bitstream, so either a QLP-header require or
    // the CRC-16 must refuse; silence or wrong samples would fail here.
    val lpc = base.clone()
    lpc(49) = 0x40.toByte // pad=0, type=100000 (LPC order 1), wasted=0
    val e = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(4L, lpc)): Unit
    }
    assert(e.getMessage.contains("media 4") || e.getMessage.contains("FLAC"),
      e.getMessage)
    val t = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(5L, base.take(base.length - 3))): Unit
    }
    assert(t.getMessage.contains("truncated") || t.getMessage.contains("CRC"),
      t.getMessage)
  }

  // ------------------------------------------------------------- LPC

  /** Deterministic quantized-predictor tables for orders 1-8: plausible
    * smooth-signal predictors (quantized around the fixed polynomials
    * plus a decaying tail), shift 5 → coefficients fit well under the
    * 15-bit QLP precision cap. */
  private def qlpFor(order: Int): (Array[Int], Int) = {
    val shift = 5
    val base = Array(32, -14, 9, -6, 4, -3, 2, -1) // x/32 fixed-point taps
    (Array.tabulate(order)(j => base(j) + order - j), shift)
  }

  test("LPC round-trip: orders 1-8, partitioned residuals, multi-frame, " +
      "short tail, mixed with FIXED frames") {
    val s = saw(300, 13L) // 4 full 64-frames + a 44-sample tail
    (1 to 8).foreach { o =>
      val bytes = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
        orderFor = _ => 0, partitionOrder = 2, lpcFor = _ => Some(qlpFor(o)))
      assert(FlacPcm.decode(MediaItem(100L + o, bytes)).toSeq == s.toSeq,
        s"LPC order $o")
    }
    // alternate LPC / FIXED / VERBATIM frames in one stream
    val mixed = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = f => if (f % 3 == 1) 2 else -1,
      lpcFor = f => if (f % 3 == 0) Some(qlpFor(1 + f % 8)) else None)
    assert(FlacPcm.decode(MediaItem(110L, mixed)).toSeq == s.toSeq)
  }

  test("LPC with negative coefficients and a zero shift round-trips") {
    val s = saw(128, 29L)
    val bytes = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => 0, lpcFor = _ => Some((Array(2, -1), 0)))
    assert(FlacPcm.decode(MediaItem(120L, bytes)).toSeq == s.toSeq)
  }

  test("corrupt QLP headers refuse: precision code 15, negative shift, " +
      "flipped coefficient") {
    val s = saw(64, 17L)
    val base = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => 0, lpcFor = _ => Some(qlpFor(2)))
    // subframe layout after byte 49: type byte, 2x16-bit warmup, then
    // the 4-bit precision field starts at bit 0 of byte 54
    val precBad = base.clone()
    precBad(54) = (precBad(54) | 0xF0).toByte // precision code 15
    val e1 = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(130L, precBad)): Unit
    }
    assert(e1.getMessage.contains("precision") || e1.getMessage.contains("CRC"),
      e1.getMessage)
    // negative shift: the 5-bit field spans byte 54 bit 4 .. byte 55 bit 0;
    // setting its sign bit (byte 54 bit 4) makes it two's-complement negative
    val shiftBad = base.clone()
    shiftBad(54) = (shiftBad(54) | 0x08).toByte
    val e2 = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(131L, shiftBad)): Unit
    }
    assert(e2.getMessage.contains("shift") || e2.getMessage.contains("CRC"),
      e2.getMessage)
    // a flipped coefficient byte must be caught by the CRC-16, never
    // silently decode to different samples
    val coefBad = base.clone()
    coefBad(56) = (coefBad(56) ^ 0x10).toByte
    val e3 = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(132L, coefBad)): Unit
    }
    assert(e3.getMessage.contains("CRC") || e3.getMessage.contains("media 132"),
      e3.getMessage)
  }

  test("encoder refuses block sizes beyond the 8-bit header coding") {
    val s = saw(600, 3L)
    val e = intercept[IllegalArgumentException] {
      FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 512,
        orderFor = _ => 0): Unit
    }
    assert(e.getMessage.contains("8-bit"), e.getMessage)
  }

  test("8-bit and 24-bit mono round-trip losslessly, FIXED and LPC arms") {
    val s8 = Array.tabulate(200)(i => ((i * 37 + 11) % 200) - 100)
    (0 to 2).foreach { o =>
      val b = FlacPcm.FlacPcmEncoder.encode(s8, 8000, blockSize = 64,
        orderFor = _ => o, partitionOrder = 1, bps = 8)
      assert(FlacPcm.decode(MediaItem(300L + o, b)).toSeq == s8.toSeq, s"8-bit o$o")
    }
    val s24 = Array.tabulate(200)(i =>
      (((i * 104729L + 7) * (i + 3)) % 16000000L - 8000000L).toInt)
    assert(s24.forall(v => v >= -(1 << 23) && v < (1 << 23)))
    val b24 = FlacPcm.FlacPcmEncoder.encode(s24, 8000, blockSize = 64,
      orderFor = _ => 2, partitionOrder = 1, bps = 24)
    assert(FlacPcm.decode(MediaItem(310L, b24)).toSeq == s24.toSeq)
    val lpc24 = FlacPcm.FlacPcmEncoder.encode(s24, 8000, blockSize = 64,
      orderFor = _ => 0, lpcFor = _ => Some((Array(2, -1), 0)), bps = 24)
    assert(FlacPcm.decode(MediaItem(311L, lpc24)).toSeq == s24.toSeq)
    // out-of-range samples refuse at encode time per depth
    val e = intercept[IllegalArgumentException] {
      FlacPcm.FlacPcmEncoder.encode(Array(200), 8000, 64, _ => 0, bps = 8): Unit
    }
    assert(e.getMessage.contains("8-bit range"), e.getMessage)
  }

  test("12-bit and 20-bit mono complete the depth matrix, FIXED and LPC arms") {
    val s12 = Array.tabulate(200)(i => ((i * 137 + 19) % 4096) - 2048)
    (0 to 2).foreach { o =>
      val b = FlacPcm.FlacPcmEncoder.encode(s12, 8000, blockSize = 64,
        orderFor = _ => o, partitionOrder = 1, bps = 12)
      assert(FlacPcm.decode(MediaItem(320L + o, b)).toSeq == s12.toSeq, s"12-bit o$o")
    }
    val s20 = Array.tabulate(200)(i =>
      (((i * 104729L + 7) * (i + 3)) % 1000000L - 500000L).toInt)
    assert(s20.forall(v => v >= -(1 << 19) && v < (1 << 19)))
    val b20 = FlacPcm.FlacPcmEncoder.encode(s20, 8000, blockSize = 64,
      orderFor = _ => 2, partitionOrder = 1, bps = 20)
    assert(FlacPcm.decode(MediaItem(330L, b20)).toSeq == s20.toSeq)
    val lpc20 = FlacPcm.FlacPcmEncoder.encode(s20, 8000, blockSize = 64,
      orderFor = _ => 0, lpcFor = _ => Some((Array(2, -1), 0)), bps = 20)
    assert(FlacPcm.decode(MediaItem(331L, lpc20)).toSeq == s20.toSeq)
    // per-depth encode ranges still fence
    val e12 = intercept[IllegalArgumentException] {
      FlacPcm.FlacPcmEncoder.encode(Array(2048), 8000, 64, _ => 0, bps = 12): Unit
    }
    assert(e12.getMessage.contains("12-bit range"), e12.getMessage)
    val e20 = intercept[IllegalArgumentException] {
      FlacPcm.FlacPcmEncoder.encode(Array(1 << 19), 8000, 64, _ => 0, bps = 20): Unit
    }
    assert(e20.getMessage.contains("20-bit range"), e20.getMessage)
  }

  // ---------------------------------------------------------- stereo

  test("stereo round-trip: all four channel assignments decode lossless " +
      "and interleaved") {
    val l = saw(300, 21L)
    val r = saw(300, 22L)
    Seq(1, 8, 9, 10).foreach { mode =>
      val bytes = FlacPcm.FlacPcmEncoder.encodeStereo(l, r, 8000,
        blockSize = 64, modeFor = _ => mode, orderFor = _ => 2,
        partitionOrder = 1)
      val dec = FlacPcm.decode(MediaItem(200L + mode, bytes))
      assert(dec.length == 600, s"mode $mode")
      (0 until 300).foreach { i =>
        assert(dec(2 * i) == l(i) && dec(2 * i + 1) == r(i),
          s"mode $mode sample $i")
      }
    }
  }

  test("stereo: rotating assignments per frame, every fixed order, and " +
      "17-bit side-channel extremes survive") {
    val l = saw(300, 21L).updated(0, 32767).updated(1, -32768)
    val r = saw(300, 22L).updated(0, -32768).updated(1, 32767) // side ±65535
    val mixed = FlacPcm.FlacPcmEncoder.encodeStereo(l, r, 8000,
      blockSize = 64, modeFor = f => Seq(1, 8, 9, 10)(f % 4),
      orderFor = f => f % 5)
    val dec = FlacPcm.decode(MediaItem(210L, mixed))
    (0 until 300).foreach { i =>
      assert(dec(2 * i) == l(i) && dec(2 * i + 1) == r(i), s"sample $i")
    }
    // a flipped byte in a decorrelated frame still refuses via CRC
    val idx = mixed.length - 20
    val bad = mixed.clone(); bad(idx) = (bad(idx) ^ 0x11).toByte
    val e = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(211L, bad)): Unit
    }
    assert(e.getMessage.contains("media 211"), e.getMessage)
  }

  test("a crafted Rice code that overflows 32 bits refuses instead of " +
      "returning silently wrong samples") {
    // Hand-build a stream whose first residual is unary q=300000 with
    // param=14: u = q<<14 ~ 4.9e9 > 2^32, so the old Int math wrapped
    // and produced a wrong sample with a VALID CRC-8 header. The fixed
    // decoder must refuse at the residual, before any sample escapes.
    val container = FlacPcm.FlacPcmEncoder.encode(Array.fill(16)(0), 8000,
      blockSize = 16, orderFor = _ => 0).take(42) // fLaC + STREAMINFO
    val fb = new java.io.ByteArrayOutputStream()
    fb.write(container, 0, 42)
    val frame = new java.io.ByteArrayOutputStream()
    var buf = 0; var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) { frame.write(buf); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    put(0x3FFE, 14); put(0, 1); put(0, 1) // sync
    put(6, 4); put(0, 4)                  // bs code 6, rate from STREAMINFO
    put(0, 4); put(4, 3); put(0, 1)       // mono, 16-bit
    put(0, 8)                             // frame number 0
    put(16 - 1, 8)                        // 8-bit block size - 1
    val head = frame.toByteArray
    frame.write(FlacPcm.crc8(head, 0, head.length))
    put(0, 1); put(0x08, 6); put(0, 1)    // FIXED order 0
    put(0, 2); put(0, 4)                  // method 0, partition order 0
    put(14, 4)                            // rice param 14
    (0 until 300000).foreach(_ => put(0, 1)) // unary quotient q=300000
    put(1, 1)
    put(0, 14)                            // remainder 0
    put(0, 8); put(0, 8); put(0, 8)       // slack so bit reads don't hit EOF
    if (cnt > 0) put(0, 8 - cnt)
    fb.write(frame.toByteArray)
    val e = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(140L, fb.toByteArray)): Unit
    }
    assert(e.getMessage.contains("overflows 32 bits"), e.getMessage)
  }
}
