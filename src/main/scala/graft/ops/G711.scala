package graft.ops

import graft.ops.Multimodal.{MediaItem, PcmAudio}

/** REAL G.711 companded-audio decode — RIFF/WAVE format tags 6 (A-law)
  * and 7 (µ-law), the telephony/call-center corpus formats (every PSTN
  * recording and most contact-center dumps arrive companded). The
  * third compressed-audio codec to leave the stub, and the simplest:
  * G.711 is a pure per-byte 8→16-bit integer expansion, exactly
  * specified by ITU-T G.711's segment tables (the arithmetic below is
  * the table-equivalent closed form), so the mm30 gate's oracle can
  * restate the whole decode in SQL — sign, segment, mantissa and bias
  * per byte — and one wrong bit anywhere breaks the hash.
  *
  * Layout (RIFF): the standard chunk walk; `fmt ` wFormatTag 6/7 with
  * wBitsPerSample 8, `data` = one companded byte per sample,
  * channel-interleaved like PCM. Same fences as WavDecoder (chunk
  * sizes bounded by the payload, data-before-fmt refused).
  *
  * The encode half is the classic segment-search compander; decode∘
  * encode is idempotent on the decoded lattice (spec-pinned), which is
  * the exactness contract a lossy compander can honestly make.
  *
  * The reference has no audio surface (its parse stops at text rows,
  * /root/reference/src/domain/ports.rs:11-14); this extends the
  * multimodal pillar's real-decoder family (WAV PCM, IMA-ADPCM, FLAC).
  */
object G711 {

  /** µ-law byte → linear PCM (G.711 Table 2a/2b closed form). */
  def ulawToPcm(b: Int): Int = {
    val u = (~b) & 0xff
    val exp = (u >> 4) & 7
    val man = u & 0x0f
    val mag = (((man << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** A-law byte → linear PCM (G.711 Table 1a/1b closed form; even bits
    * inverted on the wire per the spec's 0x55 toggle). */
  def alawToPcm(b: Int): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val man = a & 0x0f
    val t = seg match {
      case 0 => (man << 4) + 8
      case 1 => (man << 4) + 0x108
      case s => ((man << 4) + 0x108) << (s - 1)
    }
    if ((a & 0x80) != 0) t else -t
  }

  /** Linear PCM → µ-law byte (segment search over the biased value). */
  def pcmToUlaw(pcmIn: Int): Int = {
    var p = pcmIn
    val sign = if (p < 0) { p = -p; 0x80 } else 0
    if (p > 32635) p = 32635
    p += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (p & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (p >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | man)) & 0xff
  }

  /** Linear PCM → A-law byte. */
  def pcmToAlaw(pcmIn: Int): Int = {
    var p = pcmIn
    val sign = if (p >= 0) 0x80 else { p = -p; 0 }
    if (p > 32767) p = 32767
    var seg = 0
    var v = p >> 4 // A-law codes the top 12 magnitude bits
    while (seg < 7 && v >= (if (seg == 0) 16 else 16 << seg)) seg += 1
    val man =
      if (seg == 0) (p >> 4) & 0x0f
      else (p >> (seg + 3)) & 0x0f
    ((sign | (seg << 4) | man) ^ 0x55) & 0xff
  }

  /** Decode a G.711 WAVE (format tag 6 or 7) to linear PCM. */
  def decode(item: MediaItem): PcmAudio = {
    val p = item.payload
    val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(Adpcm.isWave(p), s"media ${item.mediaId}: not a RIFF/WAVE file")
    var pos = 12
    var tag = -1
    var channels = -1
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= p.length && (tag < 0 || samples == null)) {
      val id = new String(p, pos, 4, "US-ASCII")
      val size = b.getInt(pos + 4)
      require(size >= 0 && size <= p.length - pos - 8,
        s"media ${item.mediaId}: chunk '$id' overruns the payload")
      id match {
        case "fmt " =>
          require(size >= 16, s"media ${item.mediaId}: fmt chunk too short")
          tag = b.getShort(pos + 8) & 0xffff
          channels = b.getShort(pos + 10)
          sampleRate = b.getInt(pos + 12)
          val bits = b.getShort(pos + 22)
          require(tag == 6 || tag == 7,
            s"media ${item.mediaId}: not a G.711 stream (format tag $tag)")
          require(bits == 8,
            s"media ${item.mediaId}: G.711 samples are 8-bit (got $bits)")
          require(channels > 0 && channels <= 2 && sampleRate > 0,
            s"media ${item.mediaId}: invalid fmt (channels=$channels, rate=$sampleRate)")
        case "data" =>
          require(tag > 0, s"media ${item.mediaId}: data chunk before fmt chunk")
          val out = new Array[Short](size)
          var i = 0
          if (tag == 7) while (i < size) { out(i) = ulawToPcm(p(pos + 8 + i) & 0xff).toShort; i += 1 }
          else while (i < size) { out(i) = alawToPcm(p(pos + 8 + i) & 0xff).toShort; i += 1 }
          samples = out
        case _ => () // LIST/fact/junk
      }
      pos += 8 + size + (size & 1)
    }
    require(samples != null, s"media ${item.mediaId}: no data chunk")
    PcmAudio(sampleRate, channels, samples)
  }

  /** Wrap companded bytes as a G.711 WAVE file (the fixture writer). */
  def encodeWav(tag: Int, sampleRate: Int, channels: Int,
      data: Array[Byte]): Array[Byte] = {
    require(tag == 6 || tag == 7, s"not a G.711 format tag: $tag")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    out.write("RIFF".getBytes("US-ASCII"))
    w32(4 + 24 + 8 + data.length + (data.length & 1))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16)
    w16(tag); w16(channels); w32(sampleRate)
    w32(sampleRate * channels) // byte rate: 1 byte/sample
    w16(channels); w16(8)      // block align, bits
    out.write("data".getBytes("US-ASCII")); w32(data.length)
    out.write(data)
    if ((data.length & 1) == 1) out.write(0) // word alignment pad
    out.toByteArray
  }
}
