package graft.ops

import graft.SparkSpec
import Multimodal.MediaItem

/** Contracts of the MJPEG/AVI decoder: container metadata round-trips
  * the fixture writer, frame decode routes through the REAL baseline
  * JPEG decoder (byte-exact solid grays), stream order is frame order,
  * the signature dispatch serves AVI, and truncation/corruption refuses
  * inside the require contract (the decode-quarantine class). */
class AviSpec extends SparkSpec {

  private def fixture(vs: Seq[Int]): Array[Byte] =
    Avi.AviMjpegEncoder.encode(
      vs.map(v => Jpeg.JpegEncoder.solidGray(16, 16, v)), 16, 16,
      usPerFrame = 40000)

  test("metadata round-trips the fixture writer") {
    val m = Avi.decodeMeta(MediaItem(5L, fixture(Seq(100, 102, 104))))
    assert(m.width == 16 && m.height == 16)
    assert(m.frameCount == 3 && m.codec == "MJPG")
    assert(m.durationUs == 120000L)
  }

  test("frame decode is the real JPEG decoder: each solid gray " +
      "survives byte-exactly, stream order is frame order") {
    val item = MediaItem(1L, fixture(Seq(72, 128, 184)))
    Seq(72, 128, 184).zipWithIndex.foreach { case (v, k) =>
      val img = Avi.decodeFrame(item, k)
      assert(img.width == 16 && img.height == 16)
      assert(img.rgb.forall(b => (b & 0xFF) == v), s"frame $k gray $v")
    }
    val e = intercept[IllegalArgumentException](Avi.decodeFrame(item, 3))
    assert(e.getMessage.contains("frame 3 of 3"))
  }

  test("the signature dispatch serves AVI metadata in the mixed pass") {
    val meta = Multimodal.SniffDecoder.decode(MediaItem(2L, fixture(Seq(100))))
    assert(meta.width == 16 && meta.height == 16 && meta.frameCount == 1)
  }

  test("truncation and corruption refuse inside the require contract") {
    val base = fixture(Seq(100, 102))
    Seq(4, 11, 40, base.length / 2, base.length - 3).foreach { n =>
      intercept[IllegalArgumentException] {
        Avi.decodeMeta(MediaItem(3L, base.take(n))): Unit
      }
    }
    // a chunk whose declared size overruns its parent
    val lying = base.clone()
    // avih chunk size field sits right after "LIST<sz>hdrlavih": find it
    val idx = new String(base.map(_.toChar)).indexOf("avih") + 4
    lying(idx) = 0xff.toByte; lying(idx + 1) = 0xff.toByte
    lying(idx + 2) = 0xff.toByte; lying(idx + 3) = 0x7f.toByte
    val e = intercept[IllegalArgumentException](Avi.decodeMeta(MediaItem(4L, lying)))
    assert(e.getMessage.contains("overruns") || e.getMessage.contains("AVI"))
  }
}
