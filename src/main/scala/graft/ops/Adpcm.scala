package graft.ops

import java.io.ByteArrayOutputStream

import graft.ops.Multimodal.{MediaItem, PcmAudio}

/** REAL IMA/DVI ADPCM codec — the second compressed-audio format to
  * leave the stub (FLAC, `ops.FlacPcm`, was the first). IMA ADPCM is
  * the 4-bit adaptive-quantizer codec of the IMA "Recommended
  * Practices for Enhancing Digital Audio Compatibility" (1992), carried
  * in RIFF/WAVE as format tag 0x0011: the decoder is EXACTLY specified
  * integer arithmetic (step table + greedy bit reconstruction + index
  * adaptation), so while the codec is lossy, decode∘encode is a
  * deterministic pure function of the input and the per-step
  * reconstruction error is bounded by the current step size.
  *
  * Container shape (the Microsoft WAVEFORMATEX registration of the IMA
  * codec): `fmt ` with wFormatTag=0x11, wBitsPerSample=4, a 2-byte
  * cbSize extension carrying wSamplesPerBlock, a `fact` chunk with the
  * true sample count, and `data` as independent fixed-size blocks —
  * each block a 4-byte state header (int16 predictor = the block's
  * first OUTPUT sample, uint8 step index, reserved byte) followed by
  * packed 4-bit nibbles, low nibble first. Independent blocks are the
  * format's seek/robustness story: one corrupt block cannot poison the
  * rest (and makes the format splittable at block granularity — the
  * property a 100 TB audio scan wants).
  *
  * The reference's media handling is an unparsed-blob passthrough
  * (SURVEY §2.1); this codec exists for the multimodal pillar. Mono,
  * 16-bit source — the IMA baseline profile.
  */
object Adpcm extends Serializable {

  /** IMA step-size table (89 entries, the published constants). */
  private val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Index adaptation per nibble (magnitude 0-7; sign bit irrelevant). */
  private val IndexTable: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8,
    -1, -1, -1, -1, 2, 4, 6, 8)

  private def clampSample(v: Int): Int =
    if (v > 32767) 32767 else if (v < -32768) -32768 else v
  private def clampIndex(v: Int): Int =
    if (v < 0) 0 else if (v > 88) 88 else v

  /** Reconstruct one sample from the CURRENT state and a nibble — the
    * exactly-specified decoder step (shift-add form, no multiply, so
    * every implementation agrees bit for bit). Returns (sample, index). */
  private def step(predictor: Int, index: Int, nibble: Int): (Int, Int) = {
    val s = StepTable(index)
    var diff = s >> 3
    if ((nibble & 1) != 0) diff += s >> 2
    if ((nibble & 2) != 0) diff += s >> 1
    if ((nibble & 4) != 0) diff += s
    val p = clampSample(
      if ((nibble & 8) != 0) predictor - diff else predictor + diff)
    (p, clampIndex(index + IndexTable(nibble)))
  }

  /** Quantize one 16-bit difference against the current step — the
    * greedy bit selection of the IMA encoder. Deterministic; paired
    * with [[step]] it keeps encoder and decoder state identical. */
  private def quantize(diff0: Int, stepSize: Int): Int = {
    var nibble = if (diff0 < 0) 8 else 0
    var diff = if (diff0 < 0) -diff0 else diff0
    var s = stepSize
    if (diff >= s) { nibble |= 4; diff -= s }
    s >>= 1
    if (diff >= s) { nibble |= 2; diff -= s }
    s >>= 1
    if (diff >= s) nibble |= 1
    nibble
  }

  // ------------------------------------------------------------- encoder

  /** Encode mono 16-bit PCM as an IMA-ADPCM WAVE file (format 0x11):
    * independent blocks of `blockSamples` samples (first sample stored
    * verbatim in the block header, the rest as nibbles — so
    * blockSamples must be odd: 1 + 2*k nibble pairs byte-pack exactly). */
  def encodeWav(samples: Array[Short], sampleRate: Int,
      blockSamples: Int = 505): Array[Byte] = {
    require(samples.nonEmpty, "ADPCM encode: empty input")
    require(blockSamples >= 3 && blockSamples % 2 == 1,
      s"blockSamples must be odd >= 3 (1 header sample + nibble pairs), got $blockSamples")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val blockAlign = 4 + (blockSamples - 1) / 2
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }

    // data payload first (sizes go in the headers)
    val data = new ByteArrayOutputStream()
    var index = 0 // step index carries ACROSS blocks (standard practice:
                  // each block header snapshots it, so blocks stay
                  // independently decodable regardless)
    var base = 0
    while (base < samples.length) {
      val n = math.min(blockSamples, samples.length - base)
      var predictor = samples(base).toInt
      // block header: first sample verbatim + the step index snapshot
      data.write(predictor & 0xff); data.write((predictor >> 8) & 0xff)
      data.write(index); data.write(0)
      var lo = -1
      var i = 1
      while (i < blockSamples) { // full blocks always; tail pads with repeats
        val target = samples(math.min(base + i, samples.length - 1)).toInt
        val nib = quantize(target - predictor, StepTable(index))
        val (p2, i2) = step(predictor, index, nib)
        predictor = p2; index = i2
        if (lo < 0) lo = nib
        else { data.write(lo | (nib << 4)); lo = -1 }
        i += 1
      }
      base += blockSamples
    }
    val dataBytes = data.toByteArray

    out.write("RIFF".getBytes("US-ASCII"))
    w32(4 + (8 + 20) + (8 + 4) + (8 + dataBytes.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    w32(20) // WAVEFORMATEX(18) + 2-byte extension
    w16(0x11)                        // wFormatTag = IMA ADPCM
    w16(1)                           // mono
    w32(sampleRate)
    w32(sampleRate * blockAlign / blockSamples) // nominal avg byte rate
    w16(blockAlign)
    w16(4)                           // wBitsPerSample
    w16(2)                           // cbSize
    w16(blockSamples)                // wSamplesPerBlock
    out.write("fact".getBytes("US-ASCII"))
    w32(4)
    w32(samples.length)              // true sample count (tail un-padded)
    out.write("data".getBytes("US-ASCII"))
    w32(dataBytes.length)
    out.write(dataBytes)
    if ((dataBytes.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** RIFF/WAVE signature (shared by PCM and ADPCM payloads; AVI is
    * RIFF too but carries 'AVI ' where WAVE carries 'WAVE'). */
  def isWave(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** Metadata twin for the sniffing dispatch (the FlacMetaDecoder
    * shape: width = rate/100, height = channels, frameCount = whole
    * seconds): routes WAVE by format tag — 1 (PCM) through WavDecoder,
    * 6/7 (G.711 A-law/µ-law) through [[G711.decode]], 0x11 (IMA ADPCM)
    * through [[decode]] — so the mm25 quarantine family covers every
    * WAV generation with one signature. */
  object WaveMetaDecoder extends Multimodal.Decoder {
    override def decode(item: MediaItem): Multimodal.MediaMeta = {
      val p = item.payload
      require(isWave(p), s"media ${item.mediaId}: not a RIFF/WAVE file")
      // find the fmt tag to route; both decoders re-validate fully
      var pos = 12
      var tag = -1
      val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      while (pos + 8 <= p.length && tag < 0) {
        val id = new String(p, pos, 4, "US-ASCII")
        val size = b.getInt(pos + 4)
        require(size >= 0 && size <= p.length - pos - 8,
          s"media ${item.mediaId}: chunk '$id' overruns the payload")
        if (id == "fmt ") { require(size >= 2); tag = b.getShort(pos + 8) & 0xffff }
        else pos += 8 + size + (size & 1)
      }
      val a = tag match {
        case 1 => Multimodal.WavDecoder.decodeAudio(item)
        case 6 | 7 => G711.decode(item) // A-law / µ-law companding
        case 0x11 => Adpcm.decode(item)
        case other => throw new IllegalArgumentException(
          s"media ${item.mediaId}: unsupported WAVE format tag $other")
      }
      Multimodal.MediaMeta(item.mediaId, p.length,
        java.security.MessageDigest.getInstance("MD5").digest(p)
          .map(x => f"$x%02x").mkString,
        width = a.sampleRate / 100, height = a.channels,
        frameCount = (a.samples.length / a.channels / a.sampleRate))
    }
  }

  /** STEREO encode — the IMA layout for channels=2: each block opens
    * with one 4-byte state header PER CHANNEL (L then R), then the
    * nibble data runs in 4-byte units ALTERNATING channels (8 left
    * nibbles, 8 right nibbles, ...) — the published WAVEFORMATEX
    * registration's interleave. samplesPerBlock(per channel) =
    * (blockAlign - 8) + 1. `left`/`right` must be equal length. */
  def encodeWavStereo(left: Array[Short], right: Array[Short], sampleRate: Int,
      blockSamples: Int = 505): Array[Byte] = {
    require(left.nonEmpty && left.length == right.length,
      s"stereo ADPCM encode: equal-length non-empty channels required " +
        s"(${left.length} vs ${right.length})")
    require(blockSamples >= 9 && (blockSamples - 1) % 8 == 0,
      s"stereo blockSamples must be 1 + 8k (whole 4-byte groups), got $blockSamples")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val blockAlign = 8 + (blockSamples - 1)
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >>> 16) & 0xffff) }

    val data = new ByteArrayOutputStream()
    val index = Array(0, 0)
    var base = 0
    while (base < left.length) {
      val chans = Array(left, right)
      val pred = Array(chans(0)(base).toInt, chans(1)(base).toInt)
      // both channel headers up front
      (0 until 2).foreach { c =>
        data.write(pred(c) & 0xff); data.write((pred(c) >> 8) & 0xff)
        data.write(index(c)); data.write(0)
      }
      // nibble groups: 8 samples of one channel per 4-byte unit
      var i = 1
      while (i < blockSamples) {
        (0 until 2).foreach { c =>
          var word = 0L
          var j = 0
          while (j < 8) {
            val srcIdx = math.min(base + i + j, chans(c).length - 1)
            val nib = quantize(chans(c)(srcIdx) - pred(c), StepTable(index(c)))
            val (p2, i2) = step(pred(c), index(c), nib)
            pred(c) = p2; index(c) = i2
            word |= (nib.toLong & 0xf) << (4 * j)
            j += 1
          }
          (0 until 4).foreach(b => data.write(((word >> (8 * b)) & 0xff).toInt))
        }
        i += 8
      }
      base += blockSamples
    }
    val dataBytes = data.toByteArray

    out.write("RIFF".getBytes("US-ASCII"))
    w32(4 + (8 + 20) + (8 + 4) + (8 + dataBytes.length))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    w32(20)
    w16(0x11); w16(2); w32(sampleRate)
    w32(sampleRate * blockAlign / blockSamples)
    w16(blockAlign); w16(4); w16(2); w16(blockSamples)
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(left.length)
    out.write("data".getBytes("US-ASCII")); w32(dataBytes.length)
    out.write(dataBytes)
    if ((dataBytes.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  /** Decode an IMA-ADPCM WAVE payload to PCM — mono or stereo (the two
    * published block layouts; samples interleave L,R in the stereo
    * result). Refuses instructively on anything else — truncated
    * chunks, bad block geometry, >2 channels. */
  def decode(item: MediaItem): PcmAudio = {
    val p = item.payload
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E',
      s"media ${item.mediaId}: not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var nChannels = -1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= p.length && dataOff < 0) {
      val id = new String(p, pos, 4, "US-ASCII")
      val size = b.getInt(pos + 4)
      require(size >= 0 && size <= p.length - pos - 8,
        s"media ${item.mediaId}: chunk '$id' overruns the payload")
      id match {
        case "fmt " =>
          require(size >= 20, s"media ${item.mediaId}: ADPCM fmt chunk too short")
          val tag = b.getShort(pos + 8)
          nChannels = b.getShort(pos + 10)
          sampleRate = b.getInt(pos + 12)
          blockAlign = b.getShort(pos + 20) & 0xffff
          val bits = b.getShort(pos + 22)
          samplesPerBlock = b.getShort(pos + 26) & 0xffff
          require(tag == 0x11, s"media ${item.mediaId}: not IMA ADPCM (tag=$tag)")
          require(nChannels == 1 || nChannels == 2,
            s"media ${item.mediaId}: IMA ADPCM supports mono/stereo " +
              s"(channels=$nChannels)")
          require(bits == 4, s"media ${item.mediaId}: IMA ADPCM must be 4-bit (bits=$bits)")
          require(sampleRate > 0 && blockAlign >= 4 * nChannels,
            s"media ${item.mediaId}: invalid fmt (rate=$sampleRate, align=$blockAlign)")
          if (nChannels == 1)
            require(samplesPerBlock == 1 + (blockAlign - 4) * 2,
              s"media ${item.mediaId}: block geometry mismatch " +
                s"(samplesPerBlock=$samplesPerBlock, blockAlign=$blockAlign)")
          else {
            require((blockAlign - 8) % 8 == 0,
              s"media ${item.mediaId}: stereo data must be whole 4-byte " +
                s"channel groups (blockAlign=$blockAlign)")
            require(samplesPerBlock == 1 + (blockAlign - 8),
              s"media ${item.mediaId}: stereo block geometry mismatch " +
                s"(samplesPerBlock=$samplesPerBlock, blockAlign=$blockAlign)")
          }
        case "fact" =>
          require(size >= 4, s"media ${item.mediaId}: fact chunk too short")
          factSamples = b.getInt(pos + 8)
          require(factSamples >= 0, s"media ${item.mediaId}: negative fact count")
        case "data" =>
          require(sampleRate > 0, s"media ${item.mediaId}: data chunk before fmt chunk")
          dataOff = pos + 8
          dataLen = size
        case _ => // skip LIST/INFO/junk
      }
      pos += 8 + size + (size & 1)
    }
    require(dataOff >= 0, s"media ${item.mediaId}: no data chunk")
    require(dataLen % blockAlign == 0,
      s"media ${item.mediaId}: data is not whole blocks " +
        s"($dataLen bytes, align $blockAlign)")
    val nBlocks = dataLen / blockAlign
    val decoded = new Array[Short](nBlocks * samplesPerBlock * nChannels)
    var blk = 0
    while (blk < nBlocks) {
      val off = dataOff + blk * blockAlign
      val outBase = blk * samplesPerBlock * nChannels
      if (nChannels == 1) {
        var predictor = b.getShort(off).toInt
        var index = p(off + 2) & 0xff
        require(index <= 88, s"media ${item.mediaId}: step index $index > 88 in block $blk")
        var out = outBase
        decoded(out) = predictor.toShort; out += 1
        var i = 0
        val nNib = (blockAlign - 4) * 2
        while (i < nNib) {
          val byte = p(off + 4 + (i >> 1)) & 0xff
          val nib = if ((i & 1) == 0) byte & 0xf else byte >> 4
          val (p2, i2) = step(predictor, index, nib)
          predictor = p2; index = i2
          decoded(out) = predictor.toShort; out += 1
          i += 1
        }
      } else {
        // stereo: one header per channel, then 4-byte nibble groups
        // alternating channels; output interleaves L,R per frame
        val pred = new Array[Int](2)
        val index = new Array[Int](2)
        (0 until 2).foreach { c =>
          pred(c) = b.getShort(off + 4 * c).toInt
          index(c) = p(off + 4 * c + 2) & 0xff
          require(index(c) <= 88,
            s"media ${item.mediaId}: step index ${index(c)} > 88 in block $blk")
          decoded(outBase + c) = pred(c).toShort
        }
        val nGroups = (blockAlign - 8) / 8 // one L word + one R word each
        var g = 0
        while (g < nGroups) {
          var c = 0
          while (c < 2) {
            val wOff = off + 8 + g * 8 + c * 4
            var j = 0
            while (j < 8) {
              val byte = p(wOff + (j >> 1)) & 0xff
              val nib = if ((j & 1) == 0) byte & 0xf else byte >> 4
              val (p2, i2) = step(pred(c), index(c), nib)
              pred(c) = p2; index(c) = i2
              decoded(outBase + (1 + g * 8 + j) * 2 + c) = p2.toShort
              j += 1
            }
            c += 1
          }
          g += 1
        }
      }
      blk += 1
    }
    // fact trims the final block's padding back to the true FRAME count
    val frames = nBlocks * samplesPerBlock
    val n = if (factSamples >= 0) {
      require(factSamples <= frames,
        s"media ${item.mediaId}: fact count $factSamples exceeds decoded $frames")
      factSamples
    } else frames
    PcmAudio(sampleRate, nChannels,
      java.util.Arrays.copyOf(decoded, n * nChannels))
  }
}
