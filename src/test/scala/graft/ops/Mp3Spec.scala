package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaItem
import Mp3.{Mp3Encoder, Mp3MetaDecoder}

/** Contracts for the MP3 container walk: exact frame accounting, ID3v2
  * text extraction, VBR detection, and refusal contracts. */
class Mp3Spec extends AnyFunSuite {

  test("fixture round-trips: tags, frame count, exact duration") {
    // 128 kbps (idx 9) @ 44100: frameLen = 417, 1152 samples/frame
    val bytes = Mp3Encoder.encode("Test Title", "Test Artist", nFrames = 38)
    val m = Mp3.parse(MediaItem(1L, bytes))
    assert(m.title == "Test Title" && m.artist == "Test Artist")
    assert(m.mpegVersion == "MPEG1" && m.sampleRate == 44100
      && m.firstBitrateKbps == 128 && !m.vbr)
    assert(m.nFrames == 38L)
    assert(m.durationMs == 38L * 1152L * 1000L / 44100L)
  }

  test("mixed bitrates flag VBR; frame lengths still walk exactly") {
    val a = Mp3Encoder.encode("t", "a", nFrames = 2, bitrateIdx = 9)
    val b = Mp3Encoder.encode("t", "a", nFrames = 1, bitrateIdx = 11) // 192 kbps
    // strip b's ID3 tag (10 + frames) and append its audio frames to a
    val bTagSize = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
      ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
    val joined = a ++ b.drop(10 + bTagSize)
    val m = Mp3.parse(MediaItem(2L, joined))
    assert(m.vbr && m.nFrames == 3L && m.firstBitrateKbps == 128)
  }

  test("Decoder surface packs sampleRate/bitrate/frames into MediaMeta") {
    val meta = Mp3MetaDecoder.decode(MediaItem(3L,
      Mp3Encoder.encode("x", "y", nFrames = 5)))
    assert(meta.width == 441 && meta.height == 128 && meta.frameCount == 5)
  }

  test("garbage, truncation, and non-Layer-III are refused") {
    intercept[IllegalArgumentException](Mp3.parse(MediaItem(4L, Array[Byte](1, 2, 3))))
    val good = Mp3Encoder.encode("t", "a", nFrames = 2)
    intercept[IllegalArgumentException](
      Mp3.parse(MediaItem(5L, java.util.Arrays.copyOf(good, good.length - 10))))
    // flip layer bits to Layer I
    val l1 = good.clone()
    val tagSize = ((l1(6) & 0x7F) << 21) | ((l1(7) & 0x7F) << 14) |
      ((l1(8) & 0x7F) << 7) | (l1(9) & 0x7F)
    l1(10 + tagSize + 1) = 0xFF.toByte // version+layer bits -> Layer I
    val e = intercept[IllegalArgumentException](Mp3.parse(MediaItem(6L, l1)))
    assert(e.getMessage.contains("Layer III"))
  }
}
