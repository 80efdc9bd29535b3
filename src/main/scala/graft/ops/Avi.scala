package graft.ops

import Multimodal.{MediaItem, PixelImage}

/** MJPEG-in-AVI — REAL video FRAME decode, pure JVM. The "video codecs
  * stay stubbed" boundary holds for inter-frame codecs (H.264 & co.
  * genuinely need native decoders), but MOTION JPEG is the one video
  * codec whose frames this repo already decodes for real: every frame
  * is an independent baseline JPEG ([[Jpeg.JpegDecoder]]), and the AVI
  * container around it is public RIFF byte layout (the WAV sibling —
  * 'RIFF' size 'AVI ', LIST trees, fourcc+size chunks, even-byte
  * padding). So an MJPEG corpus gets the full real treatment: container
  * metadata (dims, frame count, duration, codec) for the curation pass,
  * and per-frame pixel decode -> luma/dHash features through the SAME
  * decoder the image corpus uses.
  *
  * Parsed: `avih` (usec/frame, total frames, dims), the first `strl`'s
  * `strh` (fccType/fccHandler), and the `movi` LIST's `00dc`/`00db`
  * chunks (one compressed frame each, in stream order). The optional
  * `idx1` index is ignored — stream order IS frame order for the
  * fixtures and for every writer that appends frames sequentially.
  * Truncated/corrupt files refuse via `require` (the decode-quarantine
  * contract), never a raw bounds escape.
  *
  * [[AviMjpegEncoder]] is the matching deterministic fixture writer
  * (frames supplied as encoded JPEG bytes, e.g.
  * [[Jpeg.JpegEncoder.solidGray]]).
  */
object Avi {

  final case class AviMeta(mediaId: Long, width: Int, height: Int,
      frameCount: Int, codec: String, durationUs: Long)

  private def u32(p: Array[Byte], at: Int): Long = {
    require(at >= 0 && at + 4 <= p.length, s"AVI: read past end of file (byte $at)")
    ((p(at) & 0xffL)) | ((p(at + 1) & 0xffL) << 8) |
      ((p(at + 2) & 0xffL) << 16) | ((p(at + 3) & 0xffL) << 24)
  }

  private def fourcc(p: Array[Byte], at: Int): String = {
    require(at >= 0 && at + 4 <= p.length, s"AVI: read past end of file (byte $at)")
    new String(p, at, 4, "US-ASCII")
  }

  def isAvi(p: Array[Byte]): Boolean =
    p.length >= 12 && fourcc(p, 0) == "RIFF" && fourcc(p, 8) == "AVI "

  /** Walks the chunks in [start, end); f(fourcc, payloadStart,
    * payloadEnd). LIST chunks are passed as their LIST TYPE with the
    * payload AFTER the type word, so callers recurse by type. */
  private def walk(p: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var pos = start
    while (pos + 8 <= end) {
      val id = fourcc(p, pos)
      val size = u32(p, pos + 4)
      require(size <= Int.MaxValue - 8, s"AVI: chunk '$id' size out of range")
      val dataStart = pos + 8
      val dataEnd = dataStart + size.toInt
      require(dataEnd <= end, s"AVI: chunk '$id' at byte $pos overruns its parent")
      if (id == "LIST") {
        require(size >= 4, "AVI: LIST chunk too small for its type word")
        f(fourcc(p, dataStart), dataStart + 4, dataEnd)
      } else f(id, dataStart, dataEnd)
      pos = dataEnd + (size.toInt & 1) // chunks pad to even byte counts
    }
  }

  /** Container metadata: one pass over hdrl. */
  def decodeMeta(item: MediaItem): AviMeta = {
    val p = item.payload
    require(isAvi(p), s"media ${item.mediaId}: not a RIFF/AVI payload")
    var usPerFrame = 0L; var frames = 0L; var w = 0; var h = 0
    var codec = ""
    walk(p, 12, p.length) {
      case ("hdrl", s, e) =>
        walk(p, s, e) {
          case ("avih", as, ae) =>
            require(ae - as >= 40, "AVI: avih header truncated")
            usPerFrame = u32(p, as)
            frames = u32(p, as + 16)
            w = u32(p, as + 32).toInt
            h = u32(p, as + 36).toInt
          case ("strl", ss, se) =>
            walk(p, ss, se) {
              case ("strh", hs, he) if codec.isEmpty =>
                require(he - hs >= 8, "AVI: strh header truncated")
                if (fourcc(p, hs) == "vids") codec = fourcc(p, hs + 4)
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    require(w > 0 && h > 0 && frames > 0, s"media ${item.mediaId}: AVI carries no video")
    AviMeta(item.mediaId, w, h, frames.toInt, codec, usPerFrame * frames)
  }

  /** The compressed bytes of every video frame, stream order. */
  private def frameChunks(p: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    walk(p, 12, p.length) {
      case ("movi", s, e) =>
        walk(p, s, e) {
          case (id, fs, fe) if id.endsWith("dc") || id.endsWith("db") =>
            out += ((fs, fe))
          case _ => ()
        }
      case _ => ()
    }
    out.result()
  }

  /** REAL pixel decode of frame `idx` — the payload routes through the
    * same baseline-JPEG decoder the image corpus uses. */
  def decodeFrame(item: MediaItem, idx: Int): PixelImage = {
    val p = item.payload
    require(isAvi(p), s"media ${item.mediaId}: not a RIFF/AVI payload")
    val chunks = frameChunks(p)
    require(idx >= 0 && idx < chunks.size,
      s"media ${item.mediaId}: frame $idx of ${chunks.size} requested")
    val (s, e) = chunks(idx)
    Jpeg.JpegDecoder.decodePixels(MediaItem(item.mediaId,
      java.util.Arrays.copyOfRange(p, s, e)))
  }

  /** The [[Multimodal.Decoder]] adapter (the Mp4/Flac pattern) so the
    * signature-dispatched mixed-corpus pass serves AVI too. */
  object AviMetaDecoder extends Multimodal.Decoder {
    override def decode(item: MediaItem): Multimodal.MediaMeta = {
      val m = decodeMeta(item)
      Multimodal.MediaMeta(item.mediaId, item.payload.length,
        java.security.MessageDigest.getInstance("MD5").digest(item.payload)
          .map(b => f"$b%02x").mkString,
        width = m.width, height = m.height, frameCount = m.frameCount)
    }
  }

  /** Deterministic MJPEG/AVI fixture writer: `frames` are ALREADY
    * encoded JPEG byte payloads (the Jpeg.JpegEncoder family). */
  object AviMjpegEncoder extends Serializable {
    def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
        usPerFrame: Int): Array[Byte] = {
      require(frames.nonEmpty, "AVI fixture needs at least one frame")
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def chunk(id: String)(body: => Unit): Unit = {
        cc(id)
        val sizeAt = out.size(); w32(0)
        val start = out.size(); body
        val size = out.size() - start
        if ((size & 1) == 1) out.write(0) // pad to even
        patch32(sizeAt, size)
      }
      def list(typ: String)(body: => Unit): Unit =
        chunk("LIST") { cc(typ); body }
      // size back-patching by buffer rewrite — O(n^2) on chunk count,
      // irrelevant at fixture scale and dead simple to verify
      def patch32(at: Int, v: Int): Unit = {
        val arr = out.toByteArray
        arr(at) = (v & 0xff).toByte; arr(at + 1) = ((v >> 8) & 0xff).toByte
        arr(at + 2) = ((v >> 16) & 0xff).toByte; arr(at + 3) = ((v >> 24) & 0xff).toByte
        out.reset(); out.write(arr, 0, arr.length)
      }
      cc("RIFF"); val riffSizeAt = out.size(); w32(0); cc("AVI ")
      list("hdrl") {
        chunk("avih") {
          w32(usPerFrame.toLong); w32(0); w32(0); w32(0)
          w32(frames.size.toLong); w32(0); w32(1); w32(0)
          w32(width.toLong); w32(height.toLong)
          w32(0); w32(0); w32(0); w32(0)
        }
        list("strl") {
          chunk("strh") {
            cc("vids"); cc("MJPG")
            w32(0); w32(0); w32(0)
            w32(usPerFrame.toLong); w32(1000000L) // scale, rate
            w32(0); w32(frames.size.toLong)
            w32(frames.map(_.length).max.toLong); w32(0xffffffffL); w32(0)
            w32(0); w32(0) // rcFrame: 4 shorts = 2 u32s, making strh the spec's 56 bytes
          }
          chunk("strf") {
            w32(40); w32(width.toLong); w32(height.toLong)
            out.write(1); out.write(0); out.write(24); out.write(0) // planes, bitcount
            cc("MJPG"); w32((width.toLong * height * 3)); w32(0); w32(0); w32(0); w32(0)
          }
        }
      }
      list("movi") {
        frames.foreach { f => chunk("00dc") { out.write(f, 0, f.length) } }
      }
      patch32(riffSizeAt, out.size() - riffSizeAt - 4)
      out.toByteArray
    }
  }
}
