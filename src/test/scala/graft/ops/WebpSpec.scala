package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.{MediaItem, PixelImage}
import graft.ops.Webp.Vp8lEncoder.{Lit, Ref}

/** VP8L decode contracts, each path round-tripped through the fixture
  * encoder: full canonical prefix codes, simple codes, LZ77 backrefs
  * through BOTH distance forms (2D plane codes and the long form),
  * color cache, subtract-green and palette transforms (with sub-byte
  * pixel bundling), and the named refusals for lossy/animated/corrupt
  * input. No external binaries: the encoder writes the public
  * bitstream format the decoder reads. */
class WebpSpec extends AnyFunSuite {

  private def argbAt(x: Int, y: Int): Int =
    0xFF000000 | (((x * 7 + y * 13) % 251) << 16) |
      (((x * 3 + y * 5) % 241) << 8) | ((x * 11 + y * 2) % 233)

  private def rgbOf(pixels: Seq[Int]): Seq[(Int, Int, Int)] =
    pixels.map(p => ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF))

  private def decoded(bytes: Array[Byte]): PixelImage =
    Webp.WebpDecoder.decodePixels(MediaItem(1L, bytes))

  private def imgPixels(img: PixelImage): Seq[(Int, Int, Int)] =
    (0 until img.width * img.height).map(i =>
      (img.rgb(i * 3) & 0xFF, img.rgb(i * 3 + 1) & 0xFF, img.rgb(i * 3 + 2) & 0xFF))

  test("literal image with full canonical prefix codes round-trips") {
    val (w, h) = (19, 11)
    val pixels = for (y <- 0 until h; x <- 0 until w) yield argbAt(x, y)
    val bytes = Webp.Vp8lEncoder.encode(w, h, pixels.map(Lit(_)))
    val img = decoded(bytes)
    assert(img.width == w && img.height == h)
    assert(imgPixels(img) == rgbOf(pixels))
  }

  test("LZ77 backrefs: plane-code distances AND long-form distances reproduce pixels") {
    val w = 13
    // rows 0-1 literal, then: one full row copied from one row above
    // (dist = w = plane code (0,1)), then a long copy from far back
    val row0 = (0 until w).map(x => argbAt(x, 0))
    val row1 = (0 until w).map(x => argbAt(x, 1))
    // 16 rows: 2 literal + 14 via refs
    val toks = row0.map(Lit(_)) ++ row1.map(Lit(_)) ++ Seq(
      Ref(w, w),          // row2 = row1 (distance w -> plane code)
      Ref(w, 1),          // row3 = last pixel repeated (dist 1 -> plane (1,0))
      Ref(w * 11, 2 * w), // rows 4..14 = alternating rows 2,3 (dist 26 = (0,2))
      Ref(w, 14 * w))     // row15 = row1 again, dist 182 > neighborhood: long form
    val bytes = Webp.Vp8lEncoder.encode(w, 16, toks)
    val img = decoded(bytes)
    // reconstruct expected stream the same way the spec defines copies
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    out ++= row0; out ++= row1
    def copy(len: Int, dist: Int): Unit =
      (0 until len).foreach(_ => out += out(out.length - dist))
    copy(w, w); copy(w, 1); copy(w * 11, 2 * w); copy(w, 14 * w)
    assert(imgPixels(img) == rgbOf(out.toSeq))
  }

  test("color cache: repeated colors round-trip through cache symbols") {
    val w = 16; val h = 8
    val paletteish = Array(0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0)
    val pixels = for (y <- 0 until h; x <- 0 until w)
      yield paletteish((x * y + x) % 4)
    val bytes = Webp.Vp8lEncoder.encode(w, h, pixels.map(Lit(_)), cacheBits = 4)
    assert(imgPixels(decoded(bytes)) == rgbOf(pixels))
  }

  test("subtract-green transform inverts") {
    val (w, h) = (9, 6)
    val pixels = for (y <- 0 until h; x <- 0 until w) yield argbAt(x, y)
    // the encoder writes the transform BIT; tokens carry the residuals
    val residuals = pixels.map { p =>
      val g = (p >> 8) & 0xFF
      (p & 0xFF00FF00) | (((((p >> 16) & 0xFF) - g) & 0xFF) << 16) |
        ((((p & 0xFF) - g)) & 0xFF)
    }
    val bytes = Webp.Vp8lEncoder.encode(w, h, residuals.map(Lit(_)), subtractGreen = true)
    assert(imgPixels(decoded(bytes)) == rgbOf(pixels))
  }

  test("color-indexing transform: 4-color palette with 2-bit pixel bundling") {
    val (w, h) = (18, 5) // not a multiple of 4: exercises the ragged tail
    val palette = Array(0xFF112233, 0xFF445566, 0xFF778899, 0xFFAABBCC)
    val idx = for (y <- 0 until h; x <- 0 until w) yield (x + 2 * y) % 4
    // caller packs: 4 pixels per green byte, first pixel in the LSBs
    val packedW = (w + 3) / 4
    val packed = for (y <- 0 until h; px <- 0 until packedW) yield {
      var g = 0
      (0 until 4).foreach { k =>
        val x = px * 4 + k
        if (x < w) g |= idx(y * w + x) << (2 * k)
      }
      0xFF000000 | (g << 8)
    }
    val bytes = Webp.Vp8lEncoder.encode(w, h, packed.map(Lit(_)),
      palette = Some(palette))
    val img = decoded(bytes)
    assert(img.width == w && img.height == h)
    assert(imgPixels(img) == rgbOf(idx.map(palette(_))))
  }

  test("predictor transform: all 14 modes invert (4x4 blocks, one mode each)") {
    val (w, h) = (16, 16) // 4x4 blocks of 4x4 px: 16 blocks -> modes 0..13 + repeats
    val pixels = for (y <- 0 until h; x <- 0 until w) yield argbAt(x, y)
    val bits = 2
    def modeAt(bx: Int, by: Int): Int = (bx + by * 4) % 14
    val modeData = for (by <- 0 until 4; bx <- 0 until 4)
      yield 0xFF000000 | (modeAt(bx, by) << 8)
    val res = Webp.Vp8lEncoder.predictorResiduals(pixels, w, h, bits, modeAt)
    val bytes = Webp.Vp8lEncoder.encode(w, h, res.map(Lit(_)),
      predictor = Some((bits, modeData)))
    assert(imgPixels(decoded(bytes)) == rgbOf(pixels))
  }

  test("cross-color transform inverts (signed >>5 deltas, per-block elements)") {
    val (w, h) = (12, 8)
    val pixels = for (y <- 0 until h; x <- 0 until w) yield argbAt(x, y)
    val bits = 2
    def cteAt(bx: Int, by: Int): Int = {
      val g2r = (0x10 + bx * 7) & 0xFF
      val g2b = (0xF0 - by * 9) & 0xFF // negative as int8
      val r2b = (0x08 + bx + by) & 0xFF
      0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    }
    val cteData = for (by <- 0 until 2; bx <- 0 until 3) yield cteAt(bx, by)
    val res = Webp.Vp8lEncoder.colorResiduals(pixels, w, h, bits, cteAt)
    val bytes = Webp.Vp8lEncoder.encode(w, h, res.map(Lit(_)),
      colorTransform = Some((bits, cteData)))
    assert(imgPixels(decoded(bytes)) == rgbOf(pixels))
  }

  test("stacked transforms invert in reverse stream order (predictor then cross-color)") {
    val (w, h) = (8, 8)
    val pixels = for (y <- 0 until h; x <- 0 until w) yield argbAt(x, y)
    val bits = 3 // one block
    def modeAt(bx: Int, by: Int): Int = 7 // Average2(L, T)
    def cteAt(bx: Int, by: Int): Int = 0xFF000000 | (0x05 << 16) | (0xFA << 8) | 0x13
    // stream order [P, C] -> decode inverts C then P -> forward is P then C
    val afterP = Webp.Vp8lEncoder.predictorResiduals(pixels, w, h, bits, modeAt)
    val afterC = Webp.Vp8lEncoder.colorResiduals(afterP, w, h, bits, cteAt)
    val bytes = Webp.Vp8lEncoder.encode(w, h, afterC.map(Lit(_)),
      predictor = Some((bits, IndexedSeq(0xFF000000 | (7 << 8)))),
      colorTransform = Some((bits, IndexedSeq(cteAt(0, 0)))))
    assert(imgPixels(decoded(bytes)) == rgbOf(pixels))
  }

  test("the 2D distance map matches the spec's published head and shape") {
    assert(Webp.DistanceMap.length == 120)
    assert(Webp.DistanceMap.distinct.length == 120)
    // the first ten pairs as listed in the lossless bitstream spec
    assert(Webp.DistanceMap.take(10).toSeq == Seq(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1)))
    // domain: y=0 -> x 1..8 (left only); y 1..7 -> x -7..8
    assert(Webp.DistanceMap.forall { case (x, y) =>
      if (y == 0) x >= 1 && x <= 8 else y >= 1 && y <= 7 && x >= -7 && x <= 8 })
  }

  test("refusals are NAMED: lossy VP8, animation, truncation, non-WebP") {
    def riff(tag: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(4 + 8 + body.length + (body.length & 1))
      bb.put("WEBP".getBytes); bb.put(tag.getBytes); bb.putInt(body.length)
      bb.put(body)
      bb.array()
    }
    val lossy = intercept[IllegalArgumentException](
      decoded(riff("VP8 ", new Array[Byte](32))))
    assert(lossy.getMessage.contains("lossy") && lossy.getMessage.contains("native-codec"))
    val anim = intercept[IllegalArgumentException](
      decoded(riff("ANIM", new Array[Byte](8))))
    assert(anim.getMessage.contains("animated"))
    intercept[IllegalArgumentException](decoded("JUNKJUNKJUNK".getBytes))
    // truncations of a valid file refuse, never hang or escape
    val good = Webp.Vp8lEncoder.encode(8, 8,
      (0 until 64).map(i => Lit(argbAt(i % 8, i / 8))))
    assert(imgPixels(decoded(good)).size == 64)
    Seq(4, 13, 21, good.length - 3).foreach { cut =>
      intercept[IllegalArgumentException](decoded(good.take(cut)))
    }
  }

  test("fuzz: random byte flips decode or refuse, never escape the contract") {
    val good = Webp.Vp8lEncoder.encode(11, 9,
      (0 until 99).map(i => Lit(argbAt(i % 11, i / 11))), cacheBits = 3)
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val mutated = good.clone()
      val n = 1 + rnd.nextInt(3)
      (0 until n).foreach { _ =>
        val i = rnd.nextInt(mutated.length)
        mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { Webp.WebpDecoder.decodePixels(MediaItem(7L, mutated)): Unit }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("SniffPixelDecoder routes the RIFF/WEBP signature") {
    val bytes = Webp.Vp8lEncoder.encode(5, 4,
      (0 until 20).map(i => Lit(argbAt(i % 5, i / 5))))
    val img = Multimodal.SniffPixelDecoder.decodePixels(MediaItem(3L, bytes))
    assert(img.width == 5 && img.height == 4)
  }

  // ---------------------------------------------- metadata walk (mm32)

  test("metadata walk: lossy VP8 key-frame header yields dims, pixels stay refused") {
    val bytes = Webp.WebpFixture.lossyStill(321, 123, fillerLen = 40, seed = 9L)
    val i = Webp.info(MediaItem(1L, bytes))
    assert(i == Webp.WebpInfo("vp8", 321, 123, 1, animated = false, alphaFlagged = false))
    val m = Multimodal.SniffMetaDecoder.decode(MediaItem(1L, bytes))
    assert(m.width == 321 && m.height == 123 && m.frameCount == 1)
    val e = intercept[IllegalArgumentException](
      Multimodal.SniffPixelDecoder.decodePixels(MediaItem(1L, bytes)))
    assert(e.getMessage.contains("lossy"))
  }

  test("metadata walk: VP8X canvas wins, ANMF frames counted, alpha flag read") {
    val anim = Webp.WebpFixture.animated(100, 80,
      frameDims = Seq((10, 8), (10, 8), (10, 8)), seed = 4L)
    val ai = Webp.info(MediaItem(2L, anim))
    assert(ai == Webp.WebpInfo("vp8", 100, 80, 3, animated = true, alphaFlagged = false))
    intercept[IllegalArgumentException](
      Webp.WebpDecoder.decodePixels(MediaItem(2L, anim))) // animated refusal intact
    val inner = Webp.Vp8lEncoder.encode(7, 5,
      (0 until 35).map(i => Lit(argbAt(i % 7, i / 7))))
    val ext = Webp.WebpFixture.extendedFrom(inner, 7, 5, alpha = true)
    val xi = Webp.info(MediaItem(3L, ext))
    assert(xi == Webp.WebpInfo("vp8l", 7, 5, 1, animated = false, alphaFlagged = true))
    // VP8X wrapping does not break the lossless pixel path
    assert(Multimodal.SniffPixelDecoder.decodePixels(MediaItem(3L, ext)).width == 7)
  }

  test("metadata walk: lossless dims come from the VP8L header without pixel decode") {
    val bytes = Webp.Vp8lEncoder.encode(13, 9,
      (0 until 117).map(i => Lit(argbAt(i % 13, i / 13))))
    val i = Webp.info(MediaItem(4L, bytes))
    assert(i == Webp.WebpInfo("vp8l", 13, 9, 1, animated = false, alphaFlagged = false))
  }

  test("metadata walk refusals: interframe, missing start code, short/absent chunks") {
    val good = Webp.WebpFixture.vp8FrameBody(20, 10, fillerLen = 16, seed = 1L)
    def asRiff(body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + 8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(4 + 8 + body.length + (body.length & 1))
      bb.put("WEBP".getBytes); bb.put("VP8 ".getBytes); bb.putInt(body.length)
      bb.put(body)
      bb.array()
    }
    val inter = good.clone(); inter(0) = (inter(0) | 1).toByte
    assert(intercept[IllegalArgumentException](
      Webp.info(MediaItem(5L, asRiff(inter)))).getMessage.contains("interframe"))
    val noStart = good.clone(); noStart(3) = 0
    assert(intercept[IllegalArgumentException](
      Webp.info(MediaItem(5L, asRiff(noStart)))).getMessage.contains("start code"))
    intercept[IllegalArgumentException](Webp.info(MediaItem(5L, asRiff(good.take(6)))))
    // a container with only metadata chunks has no frame to size
    val bare = Webp.WebpFixture.extendedFrom(
      Webp.Vp8lEncoder.encode(3, 3, Seq.fill(9)(Lit(0xFF000000))), 3, 3, alpha = false)
    intercept[IllegalArgumentException](Webp.info(MediaItem(5L, bare.take(12 + 18))))
  }

  test("metadata walk: EXIF chunk parses as a raw TIFF stream, both endiannesses") {
    val inner = Webp.Vp8lEncoder.encode(6, 4,
      (0 until 24).map(i => Lit(argbAt(i % 6, i / 6))))
    Seq(true, false).foreach { le =>
      val tiff = Exif.tiffPayload(6, "camX", "2024:02:03 04:05:06",
        pixelX = 6L, pixelY = 4L, littleEndian = le)
      val bytes = Webp.WebpFixture.extendedFrom(inner, 6, 4,
        alpha = false, exifTiff = Some(tiff))
      val i = Webp.info(MediaItem(11L, bytes))
      assert(i.codec == "vp8l" && i.width == 6 && i.height == 4)
      val m = i.exif.get
      assert(m.orientation == 6 && m.make.contains("camX") &&
        m.pixelX.contains(6L) && m.pixelY.contains(4L))
      assert(m.normalizedDims(6, 4) == (4, 6)) // orientation 6 transposes
      // the pixel path is untouched by the metadata chunk
      assert(Multimodal.SniffPixelDecoder.decodePixels(MediaItem(11L, bytes)).width == 6)
    }
    // a corrupt EXIF chunk refuses (quarantine-visible), never fabricates
    val bad = Webp.WebpFixture.extendedFrom(inner, 6, 4,
      alpha = false, exifTiff = Some(Array[Byte](1, 2, 3)))
    intercept[Exception](Webp.info(MediaItem(12L, bad)))
  }

  test("metadata fuzz: random byte flips report or refuse, never escape") {
    val goods = Seq(
      Webp.WebpFixture.lossyStill(33, 21, fillerLen = 30, seed = 2L),
      Webp.WebpFixture.animated(40, 30, Seq((8, 6), (8, 6)), seed = 3L))
    val rnd = new scala.util.Random(1234)
    goods.foreach { good =>
      (0 until 200).foreach { _ =>
        val mutated = good.clone()
        (0 to rnd.nextInt(3)).foreach { _ =>
          val i = rnd.nextInt(mutated.length)
          mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        try { Webp.info(MediaItem(8L, mutated)): Unit }
        catch { case _: IllegalArgumentException => () }
      }
    }
  }
}
