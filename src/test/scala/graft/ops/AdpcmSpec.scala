package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.MediaItem

/** IMA/DVI ADPCM codec contracts (mm27 gates the corpus-scale decode):
  * the exactly-specified decoder arithmetic against a hand-computed
  * vector, block-header exactness, lossy-bounded round trips, the fact
  * trim, and the refuse-instructively boundary. */
class AdpcmSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A minimal valid IMA-ADPCM WAVE: one block, given header state and
    * nibble bytes. blockAlign = 4 + nibbleBytes.length. */
  private def oneBlockWav(predictor: Int, index: Int,
      nibbleBytes: Array[Byte], fact: Option[Int] = None): Array[Byte] = {
    val blockAlign = 4 + nibbleBytes.length
    val spb = 1 + nibbleBytes.length * 2
    val data = le16(predictor) ++ Array(index.toByte, 0.toByte) ++ nibbleBytes
    val factChunk = fact.map(n => "fact".getBytes("US-ASCII") ++ le32(4) ++ le32(n))
      .getOrElse(Array.empty[Byte])
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 28 + factChunk.length + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++
      le16(0x11) ++ le16(1) ++ le32(8000) ++ le32(8000 * blockAlign / spb) ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(spb) ++
      factChunk ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  test("decoder arithmetic matches the hand-computed IMA vector") {
    // predictor=0, index=0 (step=7). Nibble 2: diff = 7>>3 + 7>>1 = 3,
    // +3 -> 3, index 0-1 clamped 0. Nibble 7: diff = 0+1+3+7 = 11,
    // 3+11 = 14, index 0+8 = 8 (step=16). Nibble 8 (sign only):
    // diff = 16>>3 = 2, 14-2 = 12, index 8-1 = 7 (step=14).
    // Nibble 15: diff = 1+3+7+14 = 25, 12-25 = -13, index 7+8 = 15.
    val wav = oneBlockWav(0, 0, Array((2 | (7 << 4)).toByte, (8 | (15 << 4)).toByte))
    val dec = Adpcm.decode(MediaItem(1L, wav)).samples
    assert(dec.toSeq == Seq[Short](0, 3, 14, 12, -13))
  }

  test("predictor clamps at int16 and the step index clamps at [0, 88]") {
    // start at full scale, push up with max-magnitude positive nibbles
    val wav = oneBlockWav(32700, 88, Array((7 | (7 << 4)).toByte))
    val dec = Adpcm.decode(MediaItem(2L, wav)).samples
    assert(dec.toSeq == Seq[Short](32700, 32767, 32767))
    // and a long run of tiny nibbles drags the index to 0, never below
    val wav2 = oneBlockWav(0, 3, Array.fill(8)(0.toByte))
    assert(Adpcm.decode(MediaItem(3L, wav2)).samples.length == 17)
  }

  test("round trip: block headers exact, bounded-slope signals reconstruct within 2% MSE") {
    (0 until 5).foreach { v =>
      val st = 40 + v * 8
      val s = Array.tabulate(381)(i =>
        (math.abs((i * st) % 4000 - 2000) - 1000).toShort)
      val dec = Adpcm.decode(MediaItem(v.toLong,
        Adpcm.encodeWav(s, 8000, blockSamples = 127))).samples
      assert(dec.length == s.length)
      (0 until s.length by 127).foreach(k => assert(dec(k) == s(k),
        s"block-start sample $k must travel verbatim"))
      var se = 0.0; var power = 0.0
      s.indices.foreach { i =>
        val d = (dec(i) - s(i)).toDouble; se += d * d
        power += s(i).toDouble * s(i)
      }
      assert(se <= 0.02 * power, s"MSE $se vs power $power at slope $st")
    }
  }

  test("fact chunk trims tail padding to the true sample count") {
    val s = Array.tabulate(100)(i => (i * 20 - 1000).toShort) // 100 < 127
    val dec = Adpcm.decode(MediaItem(4L,
      Adpcm.encodeWav(s, 8000, blockSamples = 127))).samples
    assert(dec.length == 100)
    assert(dec(0) == s(0))
  }

  test("refusals: channel/geometry mismatch, non-ADPCM tag, overrun, fact overflow, ragged data") {
    val good = oneBlockWav(0, 0, Array(0x00.toByte))
    def mutate(off: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(off) = v; c
    }
    // channels=2 with MONO block geometry -> stereo rule refuses
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, mutate(22, 2.toByte)))
    }
    // tag=1 (plain PCM routed here is a refusal, not a misparse)
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, mutate(20, 1.toByte)))
    }
    // samplesPerBlock inconsistent with blockAlign
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, mutate(38, 99.toByte)))
    }
    // step index > 88 in the block header
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, mutate(good.length - 3, 89.toByte)))
    }
    // truncated payload: chunk overruns
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, good.dropRight(2)))
    }
    // fact larger than decodable samples
    val withFact = oneBlockWav(0, 0, Array(0x00.toByte), fact = Some(99))
    intercept[IllegalArgumentException] {
      Adpcm.decode(MediaItem(9L, withFact))
    }
  }

  test("stereo: per-channel state, header exactness, channel separation survives the interleave") {
    // channels with very different dynamics: slow triangle vs fast one —
    // per-channel quantizer state must not bleed across the interleave
    val n = 385
    val l = Array.tabulate(n)(i => (math.abs((i * 40) % 4000 - 2000) - 1000).toShort)
    val r = Array.tabulate(n)(i => (math.abs((i * 72) % 4000 - 2000) - 1000).toShort)
    val dec = Adpcm.decode(MediaItem(7L,
      Adpcm.encodeWavStereo(l, r, 8000, blockSamples = 129)))
    assert(dec.channels == 2 && dec.samples.length == n * 2)
    (0 until n by 129).foreach { k =>
      assert(dec.samples(k * 2) == l(k) && dec.samples(k * 2 + 1) == r(k),
        s"block-start frame $k must travel verbatim on both channels")
    }
    var seL = 0.0; var seR = 0.0; var pw = 0.0
    (0 until n).foreach { i =>
      val dl = (dec.samples(i * 2) - l(i)).toDouble
      val dr = (dec.samples(i * 2 + 1) - r(i)).toDouble
      seL += dl * dl; seR += dr * dr
      pw += l(i).toDouble * l(i) + r(i).toDouble * r(i)
    }
    assert(seL + seR <= 0.02 * pw, s"stereo MSE $seL/$seR vs power $pw")
    // a mono decode of the same signals must agree per channel within
    // the same bound (state independence, not just joint plausibility)
    val monoL = Adpcm.decode(MediaItem(8L, Adpcm.encodeWav(l, 8000, 127))).samples
    assert(monoL.length == n)
  }

  test("stereo refusals: ragged channels, un-groupable block size, 3 channels") {
    intercept[IllegalArgumentException] {
      Adpcm.encodeWavStereo(new Array[Short](10), new Array[Short](9), 8000)
    }
    intercept[IllegalArgumentException] {
      Adpcm.encodeWavStereo(new Array[Short](10), new Array[Short](10), 8000,
        blockSamples = 10) // not 1 + 8k
    }
    val good = Adpcm.encodeWavStereo(
      Array.tabulate(20)(i => (i * 10).toShort),
      Array.tabulate(20)(i => (i * 5).toShort), 8000, blockSamples = 17)
    val c = good.clone(); c(22) = 3.toByte // channels = 3
    intercept[IllegalArgumentException] { Adpcm.decode(MediaItem(9L, c)) }
  }

  test("the sniffing metadata dispatch routes WAVE by format tag; corrupt blobs quarantine") {
    val adpcm = Adpcm.encodeWav(
      Array.tabulate(16001)(i => ((i * 40) % 2000 - 1000).toShort), 8000)
    val metaA = Multimodal.SniffMetaDecoder.decode(MediaItem(1L, adpcm))
    assert(metaA.width == 80 && metaA.height == 1 && metaA.frameCount == 2,
      s"$metaA") // 16001 samples @ 8 kHz = 2 whole seconds
    // an unsupported WAVE tag (e.g. 2 = MS ADPCM) refuses instructively
    val msTag = oneBlockWav(0, 0, Array(0x00.toByte))
    msTag(20) = 2.toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.SniffMetaDecoder.decode(MediaItem(2L, msTag))
    }
    assert(e.getMessage.contains("format tag"))
    // quarantine: good ADPCM + truncated ADPCM + unknown bytes in one pass
    val spark = graft.GraftSession.local(cores = 4, shufflePartitions = 4)
    import spark.implicits._
    val rows = Multimodal.decodeMetaQuarantine(
      Seq((1L, adpcm), (2L, adpcm.dropRight(3)), (3L, "garbage".getBytes))
        .toDF("media_id", "payload"),
      "media_id", "payload").collect().sortBy(_.mediaId)
    assert(rows.map(_.ok).toSeq == Seq(true, false, false))
  }

  test("encoder refuses un-packable block sizes and empty input") {
    intercept[IllegalArgumentException] {
      Adpcm.encodeWav(Array[Short](1, 2, 3), 8000, blockSamples = 4)
    }
    intercept[IllegalArgumentException] {
      Adpcm.encodeWav(Array.empty[Short], 8000)
    }
  }
}
