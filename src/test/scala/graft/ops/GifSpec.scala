package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaItem
import Gif.{GifDecoder, GifEncoder}

/** Contracts for the pure-JVM GIF codec path: LZW round-trips (incl.
  * dictionary growth across clears and >255-byte sub-block framing),
  * animation frame counting without decoding, and error contracts. */
class GifSpec extends AnyFunSuite {

  test("index raster round-trips through LZW byte-exactly") {
    // 40x30 = 1200 pixels: crosses several CLEAR cycles and sub-blocks
    val w = 40; val h = 30
    val idx = Array.tabulate(w * h)(p => ((p * 13 + 7) % 256).toByte)
    val img = GifDecoder.decodePixels(MediaItem(1L, GifEncoder.encode(w, h, idx)))
    assert(img.width == w && img.height == h)
    for (p <- 0 until w * h) {
      val want = idx(p) & 0xFF // grayscale palette: index == channel value
      assert((img.rgb(p * 3) & 0xFF) == want && (img.rgb(p * 3 + 1) & 0xFF) == want
        && (img.rgb(p * 3 + 2) & 0xFF) == want)
    }
  }

  test("animated GIF: first frame decoded, all frames counted") {
    val idx = Array.tabulate(64)(p => (p * 4).toByte)
    val bytes = GifEncoder.encode(8, 8, idx, frames = 3)
    val meta = GifDecoder.decode(MediaItem(2L, bytes))
    assert(meta.width == 8 && meta.height == 8 && meta.frameCount == 3)
    val img = GifDecoder.decodePixels(MediaItem(2L, bytes))
    assert((img.rgb(3) & 0xFF) == 4) // pixel 1 -> index 4
  }

  test("SniffDecoder routes the GIF89a signature") {
    val meta = Multimodal.SniffDecoder.decode(
      MediaItem(3L, GifEncoder.encode(4, 4, new Array[Byte](16))))
    assert(meta.width == 4 && meta.height == 4 && meta.frameCount == 1)
  }

  test("corrupt streams are refused") {
    intercept[IllegalArgumentException](
      GifDecoder.decodePixels(MediaItem(4L, Array[Byte]('G', 'I', 'F', '8', '7'))))
    val good = GifEncoder.encode(8, 8, new Array[Byte](64))
    val cut = java.util.Arrays.copyOf(good, good.length - 6)
    intercept[IllegalArgumentException](GifDecoder.decodePixels(MediaItem(5L, cut)))
  }
}
