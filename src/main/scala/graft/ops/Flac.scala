package graft.ops

import Multimodal.{MediaItem, MediaMeta}

/** REAL FLAC container metadata, pure JVM — the lossless archival
  * format of curated audio sets. Like Mp3/Mp4: the AUDIO decode (LPC +
  * rice coding) stays behind the stub, but the metadata layout is
  * public (xiph FLAC format spec) and carries exactly what an audio
  * curation pass filters on — sample rate, channels, bit depth, EXACT
  * total sample count (so duration is sample-accurate, not estimated),
  * the spec-mandated MD5 of the raw PCM (a content fingerprint for
  * dedup before any decode), and Vorbis TITLE/ARTIST tags.
  *
  * Layout: "fLaC", then metadata blocks — 1-byte header (last-block
  * flag + 7-bit type) + 24-bit big-endian length. STREAMINFO (type 0,
  * 34 bytes) packs sampleRate(20) channels-1(3) bps-1(5)
  * totalSamples(36) into 8 bytes after the block/frame-size bounds,
  * then 16 bytes of PCM MD5. VORBIS_COMMENT (type 4) is
  * LITTLE-endian-length-prefixed UTF-8 "KEY=value" strings (the one
  * little-endian island in an otherwise big-endian format). */
object Flac {

  final case class FlacMeta(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long, pcmMd5: String,
      title: String, artist: String)

  def isFlac(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'f' && p(1) == 'L' && p(2) == 'a' && p(3) == 'C'

  def parse(item: MediaItem): FlacMeta = {
    val p = item.payload
    val id = item.mediaId
    require(isFlac(p), s"media $id: missing fLaC signature")
    var pos = 4
    var sawStreamInfo = false
    var sampleRate, channels, bps = 0
    var totalSamples = 0L
    var pcmMd5 = ""
    var title = ""
    var artist = ""
    var last = false
    while (!last) {
      require(pos + 4 <= p.length, s"media $id: truncated metadata block header")
      last = (p(pos) & 0x80) != 0
      val typ = p(pos) & 0x7F
      val len = ((p(pos + 1) & 0xFF) << 16) | ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
      val body = pos + 4
      require(body + len <= p.length, s"media $id: metadata block overruns file")
      typ match {
        case 0 => // STREAMINFO
          require(len == 34, s"media $id: STREAMINFO must be 34 bytes, got $len")
          // bytes 10..17: sampleRate(20) channels-1(3) bps-1(5) samples(36)
          var acc = 0L
          var i = 0
          while (i < 8) { acc = (acc << 8) | (p(body + 10 + i) & 0xFFL); i += 1 }
          sampleRate = (acc >>> 44).toInt
          channels = ((acc >>> 41) & 0x7).toInt + 1
          bps = ((acc >>> 36) & 0x1F).toInt + 1
          totalSamples = acc & 0xFFFFFFFFFL
          pcmMd5 = (0 until 16).map(i => f"${p(body + 18 + i) & 0xFF}%02x").mkString
          sawStreamInfo = true
        case 4 => // VORBIS_COMMENT (little-endian lengths)
          // every read is bounds-checked and every length sign-checked:
          // a corrupt/hostile comment block must refuse, not walk
          // backwards (negative length) or read past the buffer
          def le32(off: Int): Int = {
            require(off >= body && off + 4 <= body + len,
              s"media $id: vorbis comment overruns block")
            (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8) |
              ((p(off + 2) & 0xFF) << 16) | ((p(off + 3) & 0xFF) << 24)
          }
          var cp = body
          val vendorLen = le32(cp)
          require(vendorLen >= 0, s"media $id: negative vorbis vendor length")
          cp += 4 + vendorLen
          val n = le32(cp); cp += 4
          require(n >= 0, s"media $id: negative vorbis comment count")
          var j = 0
          while (j < n) {
            val cl = le32(cp); cp += 4
            require(cl >= 0 && cp + cl <= body + len,
              s"media $id: vorbis comment overruns block")
            val s = new String(p, cp, cl, "UTF-8")
            val eq = s.indexOf('=')
            if (eq > 0) {
              val key = s.substring(0, eq).toUpperCase
              if (key == "TITLE") title = s.substring(eq + 1)
              else if (key == "ARTIST") artist = s.substring(eq + 1)
            }
            cp += cl
            j += 1
          }
        case _ => () // padding / seektable / cuesheet / picture: skip
      }
      pos = body + len
    }
    require(sawStreamInfo, s"media $id: no STREAMINFO block")
    require(sampleRate > 0, s"media $id: invalid sample rate")
    FlacMeta(sampleRate, channels, bps, totalSamples,
      totalSamples * 1000L / sampleRate, pcmMd5, title, artist)
  }

  object FlacMetaDecoder extends Multimodal.Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val m = parse(item)
      MediaMeta(item.mediaId, item.payload.length,
        java.security.MessageDigest.getInstance("MD5").digest(item.payload)
          .map(b => f"$b%02x").mkString,
        width = m.sampleRate / 100, height = m.channels,
        frameCount = (m.durationMs / 1000L).toInt)
    }
  }

  /** Deterministic fixture writer: STREAMINFO + VORBIS_COMMENT (last),
    * followed by opaque frame bytes the metadata walk never touches. */
  object FlacEncoder extends Serializable {
    def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
        totalSamples: Long, title: String, artist: String,
        pcmMd5: Array[Byte] = new Array[Byte](16)): Array[Byte] = {
      require(pcmMd5.length == 16)
      val out = new java.io.ByteArrayOutputStream()
      out.write('f'); out.write('L'); out.write('a'); out.write('C')
      // STREAMINFO
      out.write(0x00); out.write(0); out.write(0); out.write(34)
      out.write(0x10); out.write(0x00) // min block 4096
      out.write(0x10); out.write(0x00) // max block 4096
      for (_ <- 0 until 6) out.write(0) // min/max frame size unknown
      val acc = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
        ((bitsPerSample - 1).toLong << 36) | (totalSamples & 0xFFFFFFFFFL)
      for (i <- 7 to 0 by -1) out.write(((acc >>> (8 * i)) & 0xFF).toInt)
      out.write(pcmMd5)
      // VORBIS_COMMENT (last metadata block)
      val vendor = "graft".getBytes("UTF-8")
      val comments = Seq(s"TITLE=$title", s"ARTIST=$artist").map(_.getBytes("UTF-8"))
      val body = new java.io.ByteArrayOutputStream()
      def le32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
        b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
        b.write((v >> 16) & 0xFF); b.write((v >> 24) & 0xFF)
      }
      le32(body, vendor.length); body.write(vendor)
      le32(body, comments.length)
      comments.foreach { c => le32(body, c.length); body.write(c) }
      val bb = body.toByteArray
      out.write(0x80 | 4)
      out.write((bb.length >> 16) & 0xFF); out.write((bb.length >> 8) & 0xFF)
      out.write(bb.length & 0xFF)
      out.write(bb)
      // opaque frame region (not parsed)
      out.write(Array.fill(32)(0x5A.toByte))
      out.toByteArray
    }
  }
}
