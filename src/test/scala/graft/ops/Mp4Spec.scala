package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaItem
import Mp4.{Mp4Encoder, Mp4MetaDecoder}

/** Contracts for the ISO-BMFF container parser: field round-trips
  * against the fixture writer, forward-compat box skipping, 64-bit
  * largesize framing, and the Decoder surface. */
class Mp4Spec extends AnyFunSuite {

  test("minimal fixture round-trips every extracted field") {
    val bytes = Mp4Encoder.minimal(timescale = 1000L, duration = 7500L,
      w = 640, h = 360, videoSamples = 180L, audioSamples = 360L)
    val m = Mp4.parse(MediaItem(1L, bytes))
    assert(m.brand == "isom")
    assert(m.timescale == 1000L && m.durationMs == 7500L)
    assert(m.tracks.size == 2)
    val v = m.tracks.find(_.handler == "vide").get
    assert(v.trackId == 1 && v.codec == "avc1" && v.width == 640 && v.height == 360)
    assert(v.timescale == 1000L && v.sampleCount == 180L)
    val a = m.tracks.find(_.handler == "soun").get
    assert(a.trackId == 2 && a.codec == "mp4a" && a.timescale == 48000L
      && a.sampleCount == 360L && a.width == 0 && a.height == 0)
  }

  test("unknown boxes are skipped by size; largesize framing parses") {
    val base = Mp4Encoder.minimal(600L, 1200L, 320, 240)
    def u32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // splice an unknown 'free' box and a largesize (size==1 + u64) 'skip'
    // box between ftyp and moov — demuxers must step over both
    val ftypEnd = 0 + u32(0).length * 0 + (((base(0) & 0xFF) << 24) | ((base(1) & 0xFF) << 16) | ((base(2) & 0xFF) << 8) | (base(3) & 0xFF))
    val free = u32(12L) ++ "free".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    val big = u32(1L) ++ "skip".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 20) ++ Array[Byte](9, 9, 9, 9)
    val spliced = base.take(ftypEnd) ++ free ++ big ++ base.drop(ftypEnd)
    val m = Mp4.parse(MediaItem(2L, spliced))
    assert(m.durationMs == 2000L && m.tracks.size == 2) // 1200/600 s
  }

  test("Decoder surface: video dims + sample count as frameCount; sniffing") {
    val bytes = Mp4Encoder.minimal(1000L, 5000L, 1280, 720, videoSamples = 125L)
    val meta = Mp4MetaDecoder.decode(MediaItem(3L, bytes))
    assert(meta.width == 1280 && meta.height == 720 && meta.frameCount == 125)
    val sniffed = Multimodal.SniffDecoder.decode(MediaItem(4L, bytes))
    assert(sniffed.width == 1280 && sniffed.frameCount == 125)
  }

  test("non-BMFF payloads and overrunning boxes are refused") {
    intercept[IllegalArgumentException](Mp4.parse(MediaItem(5L, Array[Byte](1, 2, 3))))
    val good = Mp4Encoder.minimal(600L, 600L, 320, 240)
    // corrupt the moov size to overrun the file
    val ftypLen = ((good(0) & 0xFF) << 24) | ((good(1) & 0xFF) << 16) | ((good(2) & 0xFF) << 8) | (good(3) & 0xFF)
    val bad = good.clone()
    bad(ftypLen) = 0x7F.toByte // moov size high byte -> enormous
    intercept[IllegalArgumentException](Mp4.parse(MediaItem(6L, bad)))
  }
}
