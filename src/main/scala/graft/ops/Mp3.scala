package graft.ops

import Multimodal.{MediaItem, MediaMeta}

/** REAL MP3 container metadata, pure JVM — like Mp4: the AUDIO decode
  * (polyphase filterbank + Huffman) stays behind the stub, but the
  * framing is public byte layout (ISO 11172-3), and the frame walk
  * yields exactly what an audio-corpus curation pass filters on:
  * sample rate, bitrate, CBR/VBR, frame count, exact duration — plus
  * ID3v2 text tags (title/artist), the provenance metadata crawled
  * audio usually carries.
  *
  * Layout: optional ID3v2 tag ("ID3", version, flags, syncsafe
  * length; v2.3 frames are [id4 size4 flags2 payload], text frames
  * carry an encoding byte then text), then back-to-back MPEG audio
  * frames, each a 4-byte header (sync 11 bits, version, layer,
  * bitrate index, samplerate index, padding) whose indices give the
  * exact frame byte length — so the walk needs no decode. MPEG-1
  * Layer III (the overwhelming case: 1152 samples/frame,
  * len = 144*bitrate/samplerate + pad) and MPEG-2/2.5 Layer III
  * (576 samples, half length) are supported; Layer I/II are refused
  * with a clear error. */
object Mp3 {

  final case class Mp3Meta(
      mpegVersion: String, sampleRate: Int, firstBitrateKbps: Int,
      vbr: Boolean, nFrames: Long, durationMs: Long,
      title: String, artist: String)

  private val BitrateKbpsV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateKbpsV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  private val SampleRateV1 = Array(44100, 48000, 32000, 0)

  def isMp3(p: Array[Byte]): Boolean =
    (p.length >= 3 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') ||
      (p.length >= 2 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xE0) == 0xE0)

  def parse(item: MediaItem): Mp3Meta = {
    val p = item.payload
    val id = item.mediaId
    require(isMp3(p), s"media $id: neither ID3 tag nor MPEG frame sync")
    var pos = 0
    var title = ""
    var artist = ""

    // ---- optional ID3v2 tag ----
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      val major = p(3) & 0xFF
      val tagSize = ((p(6) & 0x7F) << 21) | ((p(7) & 0x7F) << 14) |
        ((p(8) & 0x7F) << 7) | (p(9) & 0x7F)
      val tagEnd = 10 + tagSize
      require(tagEnd <= p.length, s"media $id: ID3 tag overruns file")
      var fp = 10
      while (fp + 10 <= tagEnd && p(fp) != 0) {
        val fid = new String(p, fp, 4, "US-ASCII")
        val fsize =
          if (major >= 4) // v2.4: syncsafe
            ((p(fp + 4) & 0x7F) << 21) | ((p(fp + 5) & 0x7F) << 14) |
              ((p(fp + 6) & 0x7F) << 7) | (p(fp + 7) & 0x7F)
          else
            ((p(fp + 4) & 0xFF) << 24) | ((p(fp + 5) & 0xFF) << 16) |
              ((p(fp + 6) & 0xFF) << 8) | (p(fp + 7) & 0xFF)
        require(fp + 10 + fsize <= tagEnd, s"media $id: ID3 frame $fid overruns tag")
        if ((fid == "TIT2" || fid == "TPE1") && fsize > 1) {
          require(p(fp + 10) == 0, s"media $id: only ISO-8859-1 tag text supported")
          val text = new String(p, fp + 11, fsize - 1, "ISO-8859-1")
          if (fid == "TIT2") title = text else artist = text
        }
        fp += 10 + fsize
      }
      pos = tagEnd
    }

    // ---- MPEG audio frame walk ----
    var sampleRate = 0
    var firstKbps = 0
    var vbr = false
    var nFrames = 0L
    var totalSamples = 0L
    var versionName = ""
    while (pos + 4 <= p.length) {
      require((p(pos) & 0xFF) == 0xFF && (p(pos + 1) & 0xE0) == 0xE0,
        s"media $id: lost frame sync at byte $pos")
      val h1 = p(pos + 1) & 0xFF
      val h2 = p(pos + 2) & 0xFF
      val versionBits = (h1 >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layerBits = (h1 >> 1) & 3   // 1 = Layer III
      require(layerBits == 1,
        s"media $id: only Layer III supported (layer bits $layerBits)")
      require(versionBits != 1, s"media $id: reserved MPEG version")
      val v1 = versionBits == 3
      val brIdx = (h2 >> 4) & 15
      val srIdx = (h2 >> 2) & 3
      val padding = (h2 >> 1) & 1
      require(brIdx != 0 && brIdx != 15, s"media $id: free/bad bitrate index")
      require(srIdx != 3, s"media $id: reserved sample-rate index")
      val kbps = (if (v1) BitrateKbpsV1L3 else BitrateKbpsV2L3)(brIdx)
      val sr = SampleRateV1(srIdx) / (versionBits match {
        case 3 => 1; case 2 => 2; case _ => 4
      })
      val frameLen = (if (v1) 144000 else 72000) * kbps / sr + padding
      require(pos + frameLen <= p.length, s"media $id: truncated MPEG frame")
      if (nFrames == 0) {
        sampleRate = sr; firstKbps = kbps
        versionName = versionBits match {
          case 3 => "MPEG1"; case 2 => "MPEG2"; case _ => "MPEG2.5"
        }
      } else {
        if (kbps != firstKbps) vbr = true
        require(sr == sampleRate, s"media $id: sample rate changes mid-stream")
      }
      totalSamples += (if (v1) 1152L else 576L)
      nFrames += 1
      pos += frameLen
    }
    require(nFrames > 0, s"media $id: no MPEG audio frames")
    Mp3Meta(versionName, sampleRate, firstKbps, vbr, nFrames,
      totalSamples * 1000L / sampleRate, title, artist)
  }

  /** Decoder surface: duration rides in frameCount-like slots — width
    * carries sampleRate/100 and height the first bitrate, mirroring
    * how FakeDecoder packs scalar facts into MediaMeta. */
  object Mp3MetaDecoder extends Multimodal.Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val m = parse(item)
      MediaMeta(item.mediaId, item.payload.length,
        java.security.MessageDigest.getInstance("MD5").digest(item.payload)
          .map(b => f"$b%02x").mkString,
        width = m.sampleRate / 100, height = m.firstBitrateKbps,
        frameCount = m.nFrames.toInt)
    }
  }

  /** Deterministic fixture writer: ID3v2.3 tag with TIT2/TPE1 +
    * `nFrames` valid MPEG-1 Layer III frames (zero-filled bodies). */
  object Mp3Encoder extends Serializable {
    private def textFrame(fid: String, text: String): Array[Byte] = {
      val body = Array[Byte](0) ++ text.getBytes("ISO-8859-1")
      fid.getBytes("US-ASCII") ++
        Array(((body.length >> 24) & 0xFF).toByte, ((body.length >> 16) & 0xFF).toByte,
          ((body.length >> 8) & 0xFF).toByte, (body.length & 0xFF).toByte) ++
        Array[Byte](0, 0) ++ body
    }

    def encode(title: String, artist: String, nFrames: Int,
               bitrateIdx: Int = 9, sampleRateIdx: Int = 0): Array[Byte] = {
      val frames = textFrame("TIT2", title) ++ textFrame("TPE1", artist)
      val sz = frames.length
      val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
        Array(((sz >> 21) & 0x7F).toByte, ((sz >> 14) & 0x7F).toByte,
          ((sz >> 7) & 0x7F).toByte, (sz & 0x7F).toByte) ++ frames
      val kbps = BitrateKbpsV1L3(bitrateIdx)
      val sr = SampleRateV1(sampleRateIdx)
      val frameLen = 144000 * kbps / sr // no padding bit
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
      frame(2) = ((bitrateIdx << 4) | (sampleRateIdx << 2)).toByte
      frame(3) = 0xC0.toByte // mono
      tag ++ Array.fill(nFrames)(frame).flatten
    }
  }
}
