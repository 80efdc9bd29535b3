package graft.ops

import Multimodal.{MediaItem, MediaMeta}

/** REAL MP4/MOV (ISO base media file format, ISO/IEC 14496-12) metadata
  * extraction, pure JVM. Video FRAME decode genuinely needs native
  * codecs and stays behind the FakeDecoder stub — but the CONTAINER is
  * public byte layout: a tree of length-prefixed boxes. Parsing it
  * yields everything a corpus-curation pass filters and shards on
  * (duration, dimensions, codec fourccs, track/sample counts) without
  * touching a codec, and at 100 TB that metadata pass IS the video
  * workload: decode happens later, on the tiny filtered subset, on GPU
  * boxes.
  *
  * Box grammar: u32 big-endian size + 4-char type, then payload; size 1
  * means a u64 largesize follows, size 0 means "to end of file";
  * containers (moov/trak/mdia/minf/stbl) nest boxes directly. Extracted:
  * mvhd movie timescale/duration (v0 and v1 layouts), per-track tkhd
  * id + 16.16 fixed-point display dimensions, mdhd media timescale,
  * hdlr handler ('vide'/'soun'), stsd first sample-entry fourcc (the
  * codec), stsz/stz2 sample count. Unknown boxes are skipped by size —
  * exactly how real demuxers stay forward-compatible. */
object Mp4 {

  final case class TrackMeta(
      trackId: Int, handler: String, codec: String,
      width: Int, height: Int, timescale: Long, sampleCount: Long)

  final case class Mp4Meta(
      brand: String, timescale: Long, durationMs: Long, tracks: Seq[TrackMeta])

  private final class Reader(p: Array[Byte]) {
    // every read bounds-checks: a truncated/corrupt file refuses (the
    // require contract) instead of escaping with a raw bounds exception
    def u8(at: Int): Int = {
      require(at >= 0 && at < p.length, s"read past end of file (byte $at)")
      p(at) & 0xFF
    }
    def u16(at: Int): Int = (u8(at) << 8) | u8(at + 1)
    def u32(at: Int): Long = (u16(at).toLong << 16) | u16(at + 2)
    def u64(at: Int): Long = (u32(at) << 32) | u32(at + 4)
    def fourcc(at: Int): String = {
      require(at >= 0 && at + 4 <= p.length, s"read past end of file (byte $at)")
      new String(p, at, 4, "US-ASCII")
    }
    def len: Int = p.length
  }

  /** Walks one box level in [start, end); calls f(type, payloadStart,
    * payloadEnd) per box. */
  private def walk(r: Reader, start: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
    var pos = start
    while (pos + 8 <= end) {
      val size32 = r.u32(pos)
      val typ = r.fourcc(pos + 4)
      var payload = pos + 8
      val boxEnd =
        if (size32 == 1L) { val s = r.u64(pos + 8); payload += 8; pos + s.toInt }
        else if (size32 == 0L) end
        else pos + size32.toInt
      require(boxEnd > pos && boxEnd <= end, s"box '$typ' overruns its container")
      f(typ, payload, boxEnd)
      pos = boxEnd
    }
  }

  def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && new String(p, 4, 4, "US-ASCII") == "ftyp"

  def parse(item: MediaItem): Mp4Meta = {
    val p = item.payload
    require(isMp4(p), s"media ${item.mediaId}: not an ISO-BMFF file (no ftyp)")
    val r = new Reader(p)
    var brand = ""
    var movieTimescale = 0L
    var movieDuration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[TrackMeta]

    walk(r, 0, r.len) {
      case ("ftyp", s, _) => brand = r.fourcc(s)
      case ("moov", moovS, moovE) =>
        walk(r, moovS, moovE) {
          case ("mvhd", s, _) =>
            val version = r.u8(s)
            if (version == 1) { movieTimescale = r.u32(s + 20); movieDuration = r.u64(s + 24) }
            else { movieTimescale = r.u32(s + 12); movieDuration = r.u32(s + 16) }
          case ("trak", trakS, trakE) =>
            var trackId = 0
            var w = 0
            var h = 0
            var handler = ""
            var codec = ""
            var mediaTimescale = 0L
            var sampleCount = 0L
            walk(r, trakS, trakE) {
              case ("tkhd", s, _) =>
                val v = r.u8(s)
                // v0: ver/flags(4) c(4) m(4) id(4); v1: 8-byte times
                trackId = (if (v == 1) r.u32(s + 20) else r.u32(s + 12)).toInt
                val dimAt = s + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4) +
                  8 + 2 + 2 + 2 + 2 + 36
                w = (r.u32(dimAt) >> 16).toInt  // 16.16 fixed point
                h = (r.u32(dimAt + 4) >> 16).toInt
              case ("mdia", mdiaS, mdiaE) =>
                walk(r, mdiaS, mdiaE) {
                  case ("mdhd", s, _) =>
                    mediaTimescale = if (r.u8(s) == 1) r.u32(s + 20) else r.u32(s + 12)
                  case ("hdlr", s, _) =>
                    handler = r.fourcc(s + 8) // ver/flags(4) predefined(4) handler(4)
                  case ("minf", minfS, minfE) =>
                    walk(r, minfS, minfE) {
                      case ("stbl", stblS, stblE) =>
                        walk(r, stblS, stblE) {
                          case ("stsd", s, _) =>
                            if (r.u32(s + 4) > 0) codec = r.fourcc(s + 12)
                          case ("stsz", s, _) =>
                            sampleCount = r.u32(s + 8) // after ver/flags + sample_size
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            tracks += TrackMeta(trackId, handler, codec, w, h, mediaTimescale, sampleCount)
          case _ => ()
        }
      case _ => () // mdat, free, skip — demuxers skip unknown boxes by size
    }
    val durMs = if (movieTimescale > 0) movieDuration * 1000L / movieTimescale else 0L
    Mp4Meta(brand, movieTimescale, durMs, tracks.toSeq)
  }

  /** Container-level Decoder: dimensions from the first video track,
    * frameCount = its sample count (the real demuxer contract). */
  object Mp4MetaDecoder extends Multimodal.Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val meta = parse(item)
      val video = meta.tracks.find(_.handler == "vide")
      MediaMeta(item.mediaId, item.payload.length,
        java.security.MessageDigest.getInstance("MD5").digest(item.payload)
          .map(b => f"$b%02x").mkString,
        video.map(_.width).getOrElse(0),
        video.map(_.height).getOrElse(0),
        video.map(_.sampleCount.toInt).getOrElse(0))
    }
  }

  /** Deterministic fixture writer: a minimal-but-valid ISO-BMFF tree
    * (ftyp + moov(mvhd + video trak + audio trak) + empty mdat) with
    * v0 box layouts — byte layout per 14496-12, enough to exercise
    * every field the parser reads. */
  object Mp4Encoder extends Serializable {
    private def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def u16(v: Int): Array[Byte] = Array((v >> 8).toByte, (v & 0xFF).toByte)
    private def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

    private def fullBox(typ: String, payload: Array[Byte]): Array[Byte] =
      box(typ, Array[Byte](0, 0, 0, 0) ++ payload) // version 0, flags 0

    // identity display matrix (16.16 diagonal, 2.30 last entry)
    private val IdentityMatrix: Array[Byte] =
      u32(0x10000) ++ u32(0) ++ u32(0) ++ u32(0) ++ u32(0x10000) ++ u32(0) ++
        u32(0) ++ u32(0) ++ u32(0x40000000L)

    private def tkhd(trackId: Int, duration: Long, w: Int, h: Int): Array[Byte] =
      fullBox("tkhd",
        u32(0) ++ u32(0) ++ u32(trackId.toLong) ++ u32(0) ++ u32(duration) ++
          u32(0) ++ u32(0) ++ u16(0) ++ u16(0) ++ u16(0) ++ u16(0) ++
          IdentityMatrix ++
          u32(w.toLong << 16) ++ u32(h.toLong << 16))

    private def trak(trackId: Int, handler: String, codec: String,
                     timescale: Long, duration: Long, w: Int, h: Int,
                     nSamples: Long): Array[Byte] = {
      val stsd = fullBox("stsd", u32(1) ++
        box(codec, new Array[Byte](70))) // opaque sample-entry body
      val stsz = fullBox("stsz", u32(0) ++ u32(nSamples))
      val stbl = box("stbl", stsd ++ stsz)
      val minf = box("minf", stbl)
      val mdhd = fullBox("mdhd", u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration) ++
        u16(0x55C4) ++ u16(0)) // language 'und'
      val hdlr = fullBox("hdlr", u32(0) ++ handler.getBytes("US-ASCII") ++
        u32(0) ++ u32(0) ++ u32(0) ++ Array[Byte](0))
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      box("trak", tkhd(trackId, duration, w, h) ++ mdia)
    }

    def minimal(timescale: Long, duration: Long, w: Int, h: Int,
                videoCodec: String = "avc1", audioCodec: String = "mp4a",
                videoSamples: Long = 0L, audioSamples: Long = 0L): Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++
        "isom".getBytes("US-ASCII") ++ "mp41".getBytes("US-ASCII"))
      val mvhd = fullBox("mvhd", u32(0) ++ u32(0) ++ u32(timescale) ++ u32(duration) ++
        u32(0x10000) ++ u16(0x0100) ++ u16(0) ++ u32(0) ++ u32(0) ++
        (1 to 9).flatMap(i => u32(if (i == 1 || i == 5) 0x10000 else if (i == 9) 0x40000000L else 0)).toArray ++
        (1 to 6).flatMap(_ => u32(0)).toArray ++ u32(3))
      val moov = box("moov",
        mvhd ++
          trak(1, "vide", videoCodec, timescale, duration, w, h, videoSamples) ++
          trak(2, "soun", audioCodec, 48000L, duration * 48000L / math.max(1L, timescale), 0, 0, audioSamples))
      ftyp ++ moov ++ box("mdat", Array.emptyByteArray)
    }
  }
}
