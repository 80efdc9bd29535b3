package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaItem
import Jpeg.{JpegDecoder, JpegEncoder, ZigZag}

/** Contracts for the pure-JVM baseline JPEG codec path. The encoder is
  * the fixture side; the DECODER is the product — so the reference
  * results here are computed independently (direct O(n^4) IDCT, the
  * textbook formula) rather than by trusting any decoder internals. */
class JpegSpec extends AnyFunSuite {

  /** Independent reference: dequantize (scan order k carries quant(k)),
    * direct 2-D IDCT, round, level-shift, clamp — T.81 A.3.3 verbatim. */
  private def referenceDecode(quantizedNatural: Array[Int], quant: Array[Int]): Array[Int] = {
    val deq = new Array[Double](64)
    for (k <- 0 until 64) deq(ZigZag(k)) = quantizedNatural(ZigZag(k)).toDouble * quant(k)
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var acc = 0.0
      for (r <- 0 until 8; c <- 0 until 8) {
        val cr = if (r == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cc = if (c == 0) 1.0 / math.sqrt(2.0) else 1.0
        acc += cr * cc / 4.0 * deq(r * 8 + c) *
          math.cos((2 * y + 1) * r * math.Pi / 16.0) *
          math.cos((2 * x + 1) * c * math.Pi / 16.0)
      }
      val v = Math.round(acc).toInt + 128
      out(y * 8 + x) = math.max(0, math.min(255, v))
    }
    out
  }

  test("solid gray decodes byte-exactly at every block position") {
    for (v <- Seq(72, 128, 184, 254)) {
      val bytes = JpegEncoder.solidGray(16, 16, v)
      val img = JpegDecoder.decodePixels(MediaItem(v.toLong, bytes))
      assert(img.width == 16 && img.height == 16)
      assert(img.rgb.forall(b => (b & 0xFF) == v), s"solid $v must survive the DCT round-trip")
    }
  }

  test("arbitrary coefficients: decoder matches the independent reference IDCT") {
    // exercises DC sign, low/high AC frequencies, a ZRL-forcing gap,
    // and negative magnitudes
    val coefs = new Array[Int](64)
    coefs(0) = 13            // DC
    coefs(1) = 5             // horizontal AC
    coefs(8) = -7            // vertical AC
    coefs(ZigZag(20)) = 3    // mid-frequency
    coefs(ZigZag(45)) = -2   // after a >16-zero run (needs ZRL)
    coefs(63) = 1            // last coefficient (no EOB path)
    val quant = Array.tabulate(64)(k => 8 + (k % 5)) // non-flat table
    val img = JpegDecoder.decodePixels(MediaItem(1L,
      JpegEncoder.grayFromQuantized(coefs, quant)))
    val want = referenceDecode(coefs, quant)
    val got = Array.tabulate(64)(i => img.rgb(i * 3) & 0xFF)
    assert(got.toSeq == want.toSeq)
    // gray replicates across channels
    assert((0 until 64).forall(i => img.rgb(i * 3) == img.rgb(i * 3 + 1)
      && img.rgb(i * 3) == img.rgb(i * 3 + 2)))
  }

  test("4:2:0 solid color: chroma upsampling + YCbCr->RGB conversion") {
    val (yv, cb, cr) = (120, 100, 160)
    val img = JpegDecoder.decodePixels(MediaItem(2L,
      JpegEncoder.solidColor420(32, 16, yv, cb, cr)))
    assert(img.width == 32 && img.height == 16)
    // same formula, computed independently
    def clamp(v: Long) = math.max(0L, math.min(255L, v)).toInt
    val r = clamp(Math.round(yv + 1.402 * (cr - 128)))
    val g = clamp(Math.round(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)))
    val b = clamp(Math.round(yv + 1.772 * (cb - 128)))
    for (i <- 0 until img.width * img.height) {
      assert((img.rgb(i * 3) & 0xFF) == r && (img.rgb(i * 3 + 1) & 0xFF) == g
        && (img.rgb(i * 3 + 2) & 0xFF) == b)
    }
  }

  test("restart markers: RSTn framing decodes identically and resets DC prediction") {
    val coefs = new Array[Int](64)
    coefs(0) = 9
    coefs(1) = -4
    val plain = JpegDecoder.decodePixels(MediaItem(3L,
      JpegEncoder.grayFromQuantized(coefs)))
    // multi-block image with restarts: 4 MCUs, interval 2
    val blocks = Seq.tabulate(4) { i =>
      val b = new Array[Int](64); b(0) = 3 + i * 2; b
    }
    val withRst = JpegEncoder.encode(32, 8, Array.fill(64)(16),
      Seq(JpegEncoder.Plane(4, 1, 1, 1, blocks)), restartInterval = 2)
    val img = JpegDecoder.decodePixels(MediaItem(4L, withRst))
    // block i is solid 128 + 2*dc_i (DC-only): prediction must have
    // reset at MCU 2 for blocks 2,3 to land on their absolute values
    for (i <- 0 until 4) {
      val px = img.rgb(((0 * 32) + i * 8) * 3) & 0xFF
      assert(px == 128 + 2 * (3 + i * 2), s"block $i decoded $px")
    }
    assert(plain.width == 8) // and the no-restart single block still works
  }

  test("unsupported shapes are refused with clear errors") {
    val good = JpegEncoder.solidGray(8, 8, 130)
    // arithmetic coding: rewrite SOF0 marker byte to SOF9
    val arith = good.clone()
    val sofAt = (0 until arith.length - 1).find(i =>
      (arith(i) & 0xFF) == 0xFF && (arith(i + 1) & 0xFF) == 0xC0).get
    arith(sofAt + 1) = 0xC9.toByte
    val e1 = intercept[IllegalArgumentException](
      JpegDecoder.decodePixels(MediaItem(5L, arith)))
    assert(e1.getMessage.contains("not supported"))
    // truncated entropy stream
    val cut = java.util.Arrays.copyOf(good, good.length - 4)
    intercept[IllegalArgumentException](JpegDecoder.decodePixels(MediaItem(6L, cut)))
    // not a JPEG at all
    intercept[IllegalArgumentException](
      JpegDecoder.decodePixels(MediaItem(7L, Array[Byte](1, 2, 3))))
  }

  // ------------------------------------------------- progressive (SOF2)

  test("progressive solid gray decodes identically to its baseline twin") {
    for (v <- Seq(72, 128, 184, 254)) {
      val base = JpegDecoder.decodePixels(MediaItem(v.toLong,
        JpegEncoder.solidGray(16, 16, v)))
      val prog = JpegDecoder.decodePixels(MediaItem(v.toLong,
        JpegEncoder.solidGrayProgressive(16, 16, v)))
      assert(prog.width == 16 && prog.height == 16)
      assert(prog.rgb.toSeq == base.rgb.toSeq, s"solid $v progressive != baseline")
    }
  }

  test("progressive arbitrary coefficients: every Annex G path == baseline decode") {
    // four blocks engineered to exercise: newly-visible +-1 coefficients
    // (invisible at al=1, placed only by the refinement scan), history
    // correction bits (odd |v|), a >16-zero gap before a refinement
    // stop (ZRL-in-refinement), a content-free high band (EOB), and a
    // multi-block EOB run (blocks 2 and 3 are empty in the high band).
    def blk(entries: (Int, Int)*): Array[Int] = {
      val b = new Array[Int](64)
      entries.foreach { case (k, v) => b(ZigZag(k)) = v }
      b
    }
    val blocks = Seq(
      blk(0 -> 13, 1 -> 5, 2 -> -1, 4 -> 3, 20 -> -7, 45 -> 1, 63 -> -2),
      blk(0 -> -9, 3 -> 1, 5 -> -3, 6 -> 2, 7 -> -1, 30 -> 1),
      blk(0 -> 4, 1 -> -2, 5 -> 1),
      blk(0 -> 0))
    val quant = Array.tabulate(64)(k => 8 + (k % 5))
    val planes = Seq(JpegEncoder.Plane(2, 2, 1, 1, blocks))
    val base = JpegDecoder.decodePixels(MediaItem(10L,
      JpegEncoder.encode(16, 16, quant, planes)))
    val prog = JpegDecoder.decodePixels(MediaItem(11L,
      JpegEncoder.encodeProgressive(16, 16, quant, planes,
        JpegEncoder.grayScript(al = 1))))
    assert(prog.rgb.toSeq == base.rgb.toSeq)
    // deeper successive approximation (al = 2): same pixels again
    val prog2 = JpegDecoder.decodePixels(MediaItem(12L,
      JpegEncoder.encodeProgressive(16, 16, quant, planes,
        JpegEncoder.grayScript(al = 2))))
    assert(prog2.rgb.toSeq == base.rgb.toSeq)
  }

  test("progressive 4:2:0 color: interleaved DC scan + per-component AC == baseline") {
    def plane(bx: Int, by: Int, h: Int, v: Int, dc: Int, ac: (Int, Int)*): JpegEncoder.Plane = {
      val b = new Array[Int](64)
      b(0) = dc
      ac.foreach { case (k, vv) => b(ZigZag(k)) = vv }
      JpegEncoder.Plane(bx, by, h, v, Seq.fill(bx * by)(b))
    }
    val planes = Seq(
      plane(4, 2, 2, 2, -4, 1 -> 3, 17 -> -1),
      plane(2, 1, 1, 1, 6, 2 -> 1),
      plane(2, 1, 1, 1, -14))
    val quant = Array.fill(64)(16)
    val base = JpegDecoder.decodePixels(MediaItem(13L,
      JpegEncoder.encode(32, 16, quant, planes)))
    val scans = Seq(
      JpegEncoder.Scan(Seq(0, 1, 2), 0, 0, 0, 1), // interleaved DC first
      JpegEncoder.Scan(Seq(0, 1, 2), 0, 0, 1, 0), // interleaved DC refine
      JpegEncoder.Scan(Seq(0), 1, 63, 0, 1), JpegEncoder.Scan(Seq(0), 1, 63, 1, 0),
      JpegEncoder.Scan(Seq(1), 1, 63, 0, 0),      // spectral-only, no approximation
      JpegEncoder.Scan(Seq(2), 1, 63, 0, 0))
    val prog = JpegDecoder.decodePixels(MediaItem(14L,
      JpegEncoder.encodeProgressive(32, 16, quant, planes, scans)))
    assert(prog.width == 32 && prog.height == 16)
    assert(prog.rgb.toSeq == base.rgb.toSeq)
  }

  test("SniffDecoder routes the FFD8 signature to the JPEG decoder") {
    val meta = Multimodal.SniffDecoder.decode(
      MediaItem(8L, JpegEncoder.solidGray(24, 8, 140)))
    assert(meta.width == 24 && meta.height == 8 && meta.frameCount == 1)
  }
}
