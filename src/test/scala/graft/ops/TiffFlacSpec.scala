package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.{MediaItem, PixelImage}

/** Real baseline-TIFF decode and FLAC container metadata. */
class TiffFlacSpec extends AnyFunSuite {

  private def ramp(w: Int, h: Int): PixelImage = {
    val rgb = Array.tabulate(w * h * 3) { i =>
      val p = i / 3
      (((p * 31 + (i % 3) * 7) % 256) & 0xFF).toByte
    }
    PixelImage(w, h, rgb)
  }

  test("tiff: little-endian RGB single-strip round trip is byte-exact") {
    val img = ramp(9, 7)
    val bytes = Tiff.TiffEncoder.encode(img)
    assert(Tiff.isTiff(bytes))
    val out = Tiff.TiffDecoder.decodePixels(MediaItem(1, bytes))
    assert(out.width == 9 && out.height == 7)
    assert(out.rgb.toSeq == img.rgb.toSeq)
  }

  test("tiff: big-endian (MM) decode matches little-endian decode") {
    val img = ramp(5, 4)
    val le = Tiff.TiffDecoder.decodePixels(
      MediaItem(2, Tiff.TiffEncoder.encode(img, littleEndian = true)))
    val be = Tiff.TiffDecoder.decodePixels(
      MediaItem(2, Tiff.TiffEncoder.encode(img, littleEndian = false)))
    assert(le.rgb.toSeq == be.rgb.toSeq && le.rgb.toSeq == img.rgb.toSeq)
  }

  test("tiff: multi-strip assembly concatenates strips in order") {
    val img = ramp(6, 10)
    val bytes = Tiff.TiffEncoder.encode(img, rowsPerStrip = 3) // 4 strips
    val out = Tiff.TiffDecoder.decodePixels(MediaItem(3, bytes))
    assert(out.rgb.toSeq == img.rgb.toSeq)
  }

  test("tiff: 8-bit grayscale replicates into RGB channels") {
    val img = ramp(4, 3)
    val bytes = Tiff.TiffEncoder.encode(img, gray = true)
    val out = Tiff.TiffDecoder.decodePixels(MediaItem(4, bytes))
    val grays = Array.tabulate(12)(i => img.rgb(i * 3))
    assert(Array.tabulate(12)(i => out.rgb(i * 3)).toSeq == grays.toSeq)
    assert((0 until 12).forall(i =>
      out.rgb(i * 3) == out.rgb(i * 3 + 1) && out.rgb(i * 3) == out.rgb(i * 3 + 2)))
  }

  test("tiff: compressed / tiled / non-8-bit inputs are refused") {
    val img = ramp(4, 3)
    val ok = Tiff.TiffEncoder.encode(img)
    // compression=1 entry: flip its inline value to 5 (LZW).
    // find the IFD entry for tag 259 (LE: 03 01) and poke the value
    val bad = ok.clone()
    var i = 8 + img.rgb.length + 2
    var poked = false
    while (i + 12 <= bad.length && !poked) {
      if ((bad(i) & 0xFF) == 3 && (bad(i + 1) & 0xFF) == 1) {
        bad(i + 8) = 5; poked = true
      }
      i += 12
    }
    assert(poked)
    val e = intercept[IllegalArgumentException] {
      Tiff.TiffDecoder.decodePixels(MediaItem(5, bad))
    }
    assert(e.getMessage.contains("uncompressed"))
    assert(intercept[IllegalArgumentException] {
      Tiff.TiffDecoder.decodePixels(MediaItem(6, Array[Byte]('I', 'I', 41, 0)))
    }.getMessage.contains("TIFF"))
  }

  test("flac: STREAMINFO + vorbis tags round-trip with exact duration") {
    val md5 = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    val bytes = Flac.FlacEncoder.encode(
      sampleRate = 44100, channels = 2, bitsPerSample = 16,
      totalSamples = 441000, title = "Song A", artist = "Band B", pcmMd5 = md5)
    assert(Flac.isFlac(bytes))
    val m = Flac.parse(MediaItem(7, bytes))
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitsPerSample == 16)
    assert(m.totalSamples == 441000L)
    assert(m.durationMs == 10000L) // sample-accurate: 441000/44100 s
    assert(m.pcmMd5 == md5.map(b => f"${b & 0xFF}%02x").mkString)
    assert(m.title == "Song A" && m.artist == "Band B")
  }

  test("flac: 20-bit sample rates and 36-bit sample counts unpack correctly") {
    val bytes = Flac.FlacEncoder.encode(
      sampleRate = 192000, channels = 8, bitsPerSample = 24,
      totalSamples = 0xFFFFFFFFFL, title = "", artist = "")
    val m = Flac.parse(MediaItem(8, bytes))
    assert(m.sampleRate == 192000 && m.channels == 8 && m.bitsPerSample == 24)
    assert(m.totalSamples == 0xFFFFFFFFFL)
  }

  test("flac: garbage and truncation are refused") {
    assert(intercept[IllegalArgumentException] {
      Flac.parse(MediaItem(9, "not flac at all".getBytes))
    }.getMessage.contains("fLaC"))
    val ok = Flac.FlacEncoder.encode(44100, 2, 16, 1000, "t", "a")
    assert(intercept[IllegalArgumentException] {
      Flac.parse(MediaItem(10, ok.take(20)))
    }.getMessage.contains("overruns"))
  }

  test("signature dispatch routes TIFF pixels and FLAC metadata") {
    val img = ramp(3, 3)
    val viaSniff = Multimodal.SniffPixelDecoder.decodePixels(
      MediaItem(11, Tiff.TiffEncoder.encode(img, littleEndian = false)))
    assert(viaSniff.rgb.toSeq == img.rgb.toSeq)
    val meta = Multimodal.SniffDecoder.decode(
      MediaItem(12, Flac.FlacEncoder.encode(48000, 1, 16, 96000, "x", "y")))
    assert(meta.width == 480 && meta.height == 1 && meta.frameCount == 2)
  }
}
