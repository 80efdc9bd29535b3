package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** EXIF walker contracts: both TIFF byte orders, inline-vs-offset
  * values, the orientation axis-swap table, absence vs malformation,
  * and coexistence with the pixel decoder (APP1 must not disturb the
  * baseline decode). Pure JVM — no Spark session needed. */
class ExifSpec extends AnyFunSuite {

  private def fixture(le: Boolean, ori: Int = 6) = Exif.insertApp1(
    Jpeg.JpegEncoder.solidGray(24, 16, 100),
    Exif.app1Segment(ori, "acme", "2024:02:03 04:05:06",
      pixelX = 24L, pixelY = 16L, littleEndian = le))

  test("roundtrip parses every field under BOTH byte orders") {
    for (le <- Seq(true, false)) {
      val m = Exif.parse(fixture(le)).get
      assert(m.orientation == 6, s"le=$le")
      assert(m.make.contains("acme"))
      assert(m.dateTime.contains("2024:02:03 04:05:06"))
      assert(m.pixelX.contains(24L) && m.pixelY.contains(16L))
    }
  }

  test("orientations 5-8 swap display axes; 1-4 do not") {
    (1 to 8).foreach { o =>
      val m = Exif.parse(fixture(le = true, ori = o)).get
      assert(m.normalizedDims(24, 16) == (if (o >= 5) (16, 24) else (24, 16)), s"o=$o")
    }
  }

  test("a JPEG without EXIF parses as None; a non-JPEG errors") {
    assert(Exif.parse(Jpeg.JpegEncoder.solidGray(8, 8, 50)).isEmpty)
    intercept[IllegalArgumentException] { Exif.parse(Array[Byte](1, 2, 3, 4)) }
  }

  test("a truncated APP1 is an ERROR, not silent no-metadata") {
    val good = fixture(le = true)
    // corrupt the APP1 length to overrun the segment
    val bad = good.clone()
    bad(4) = 0x7F.toByte // APP1 length high byte -> points past the payload
    intercept[IllegalArgumentException] { Exif.parse(bad) }
  }

  test("the APP1 segment does not disturb the baseline pixel decode") {
    val withExif = fixture(le = true)
    val img = Jpeg.JpegDecoder.decodePixels(Multimodal.MediaItem(1L, withExif))
    assert(img.width == 24 && img.height == 16)
    assert(img.rgb.forall(b => (b & 0xFF) == 100))
  }
}
