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

  test("LPC subframes and truncation refuse instructively") {
    val s = saw(64, 5L)
    val base = FlacPcm.FlacPcmEncoder.encode(s, 8000, blockSize = 64,
      orderFor = _ => 0)
    // subframe type byte sits at a fixed offset in the fixture:
    // 42 bytes of container metadata + 7 frame-header bytes; an LPC
    // type (1xxxxx) refuses at subframe dispatch, before the CRC-16
    val lpc = base.clone()
    lpc(49) = 0x40.toByte // pad=0, type=100000 (LPC order 1), wasted=0
    val e = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(4L, lpc)): Unit
    }
    assert(e.getMessage.contains("LPC"), e.getMessage)
    val t = intercept[IllegalArgumentException] {
      FlacPcm.decode(MediaItem(5L, base.take(base.length - 3))): Unit
    }
    assert(t.getMessage.contains("truncated") || t.getMessage.contains("CRC"),
      t.getMessage)
  }
}
