package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque `binary` payloads + typed
  * metadata structs — the Spark-side plumbing for image/audio/video
  * feature extraction at scale.
  *
  * Formats with public byte layouts decode for REAL, pure-JVM: PPM, BMP,
  * WAV, PNG (DEFLATE via java.util.zip.Inflater) — and baseline JPEG
  * (graft.ops.Jpeg: the Huffman/DCT arithmetic implemented directly; no
  * codec library). Remaining formats (MP3/AAC audio, video codecs,
  * progressive JPEG) stay STUBBED behind `Decoder`, a pluggable
  * partition-local function. The deterministic `FakeDecoder` stands in
  * so the plumbing (schema, batch iteration, partition locality, memory
  * shape) is real and tested end-to-end; swapping in a JNI/JavaCV
  * decoder is a one-line change at the call site.
  *
  * Scale design: decode runs inside `mapPartitions` (the Scala analogue of
  * mapInPandas batch UDFs) — one decoder instance per partition, streaming
  * iterator in/out, no driver involvement, no per-row setup cost. Payload
  * columns stay off the shuffle path: metadata is extracted FIRST, then
  * only the (small) meta columns shuffle; re-join payloads by key when the
  * bytes themselves are needed downstream.
  */
object Multimodal {

  /** Typed metadata extracted from a media payload. */
  final case class MediaMeta(
      mediaId: Long,
      byteLen: Int,
      contentHash: String,
      width: Int,
      height: Int,
      frameCount: Int)

  final case class MediaItem(mediaId: Long, payload: Array[Byte])

  /** Partition-local decoder: bytes -> metadata. One instance per
    * partition; must be serializable and cheap to construct. */
  trait Decoder extends Serializable {
    def decode(item: MediaItem): MediaMeta
  }

  private[ops] def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Deterministic stand-in for the codec stack (see class doc). The
    * "decoded" dimensions are pure functions of the payload so results
    * are stable across engines, runs, and partitionings. */
  object FakeDecoder extends Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val n = item.payload.length
      MediaMeta(
        mediaId = item.mediaId,
        byteLen = n,
        contentHash = md5Hex(item.payload),
        width = n % 640,
        height = (n * 7) % 480,
        frameCount = n % 30 + 1)
    }
  }

  /** A decoded raster: row-major, top-down, 3 bytes per pixel (RGB). */
  final case class PixelImage(width: Int, height: Int, rgb: Array[Byte])

  /** Refuse implausible header dimensions BEFORE any allocation: a
    * crafted 65535x65535 frame header would otherwise allocate
    * gigabytes and kill the executor with an Error — beyond even the
    * quarantine's NonFatal reach. 64 Mpixel (~192 MB RGB) is far above
    * any real training-corpus source and also rules out the int
    * overflows of width*height*3 arithmetic. */
  private[ops] def checkDims(mediaId: Long, width: Int, height: Int): Unit = {
    require(width > 0 && height > 0,
      s"media $mediaId: non-positive dimensions ${width}x$height")
    require(width.toLong * height <= (64L << 20),
      s"media $mediaId: implausible dimensions ${width}x$height")
  }

  /** A decoder that yields real pixels, not just metadata. PPM, BMP,
    * PNG and baseline JPEG (graft.ops.Jpeg) implement it for real;
    * video codecs stay behind the stub. */
  trait PixelDecoder extends Decoder {
    def decodePixels(item: MediaItem): PixelImage
    override def decode(item: MediaItem): MediaMeta = {
      val img = decodePixels(item)
      MediaMeta(item.mediaId, item.payload.length, md5Hex(item.payload),
        img.width, img.height, frameCount = 1)
    }
  }

  /** REAL binary-PPM (P6) decoder — the whole format is three ASCII
    * header tokens (magic, dimensions, maxval; '#' comments allowed)
    * followed by width*height RGB triplets, so a dependency-free JVM
    * decode is exact. maxval must be <= 255 (1 byte/sample). */
  object PpmDecoder extends PixelDecoder {
    override def decodePixels(item: MediaItem): PixelImage = {
      val bytes = item.payload
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
        s"media ${item.mediaId}: not a P6 PPM")
      var pos = 2
      def nextToken(): String = {
        // skip whitespace and '#'-to-EOL comments between tokens
        var done = false
        while (!done) {
          while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
          if (pos < bytes.length && bytes(pos) == '#') {
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else done = true
        }
        val start = pos
        while (pos < bytes.length && !bytes(pos).toChar.isWhitespace) pos += 1
        new String(bytes, start, pos - start, "US-ASCII")
      }
      def intToken(what: String): Int = {
        val t = nextToken()
        try t.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"media ${item.mediaId}: malformed PPM $what '$t'")
        }
      }
      val width = intToken("width")
      val height = intToken("height")
      val maxval = intToken("maxval")
      checkDims(item.mediaId, width, height)
      require(maxval > 0 && maxval <= 255, s"media ${item.mediaId}: unsupported maxval $maxval")
      pos += 1 // exactly ONE whitespace byte separates header from raster
      val n = width * height * 3
      require(bytes.length - pos >= n,
        s"media ${item.mediaId}: raster truncated (${bytes.length - pos} of $n bytes)")
      PixelImage(width, height, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
    }
  }

  /** REAL uncompressed 24-bit BMP decoder (BITMAPINFOHEADER, the public
    * Windows DIB layout): pixel rows are BGR, padded to 4-byte
    * multiples, and stored bottom-up unless height is negative —
    * normalized here to top-down RGB so downstream stats are
    * orientation-independent. */
  object BmpDecoder extends PixelDecoder {
    override def decodePixels(item: MediaItem): PixelImage = {
      val b = java.nio.ByteBuffer.wrap(item.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(item.payload.length >= 54 && b.get(0) == 'B' && b.get(1) == 'M',
        s"media ${item.mediaId}: not a BMP")
      val pixelOffset = b.getInt(10)
      val width = b.getInt(18)
      val rawHeight = b.getInt(22)
      val bpp = b.getShort(28)
      val compression = b.getInt(30)
      require(bpp == 24 && compression == 0,
        s"media ${item.mediaId}: only uncompressed 24-bit BMP supported (bpp=$bpp, compression=$compression)")
      val height = math.abs(rawHeight)
      checkDims(item.mediaId, width, height)
      val topDown = rawHeight < 0
      val rowSize = ((width * 3) + 3) & ~3 // rows pad to 4-byte multiples
      require(item.payload.length >= pixelOffset + rowSize * height,
        s"media ${item.mediaId}: raster truncated")
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = pixelOffset + (if (topDown) y else height - 1 - y) * rowSize
        var x = 0
        while (x < width) {
          val s = srcRow + x * 3
          val d = (y * width + x) * 3
          out(d) = item.payload(s + 2)     // R (BMP stores BGR)
          out(d + 1) = item.payload(s + 1) // G
          out(d + 2) = item.payload(s)     // B
          x += 1
        }
        y += 1
      }
      PixelImage(width, height, out)
    }
  }

  /** REAL PNG decoder — pure JVM, no codec library: PNG's compression
    * is DEFLATE (java.util.zip.Inflater, in the JDK since 1.1) and
    * everything else is public byte layout (RFC 2083): signature, then
    * length/type/data/CRC chunks; IHDR gives dimensions + color type;
    * the concatenated IDAT chunks inflate to height scanlines, each one
    * filter-type byte + filtered samples; per-byte unfiltering (None /
    * Sub / Up / Average / Paeth) recovers the raster. Supports bit
    * depth 8 in all five color types — grayscale (0), RGB (2),
    * palette (3, via PLTE), gray+alpha (4), RGBA (6) — normalized to
    * the engine's 3-byte RGB raster (alpha dropped, gray replicated,
    * palette resolved). Adam7 interlacing and sub-byte depths are
    * refused with a clear error (the dominant training-corpus PNGs are
    * 8-bit non-interlaced; a pre-pass can re-encode stragglers).
    * This moved the dominant lossless training-image format off the
    * FakeDecoder stub; baseline JPEG followed (graft.ops.Jpeg). */
  object PngDecoder extends PixelDecoder {
    private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && (0 until 8).forall(i => p(i) == Sig(i))

    private def be32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)

    /** Standard Paeth predictor (RFC 2083 §6.6). */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    override def decodePixels(item: MediaItem): PixelImage = {
      val p = item.payload
      require(isPng(p), s"media ${item.mediaId}: not a PNG")
      var pos = 8
      var width = -1; var height = -1; var colorType = -1
      var palette: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && pos + 8 <= p.length) {
        val len = be32(p, pos)
        val typ = new String(p, pos + 4, 4, "US-ASCII")
        // overflow-safe bound, same discipline as WavDecoder's chunk walk
        require(len >= 0 && len <= p.length - pos - 12,
          s"media ${item.mediaId}: chunk '$typ' overruns the payload")
        typ match {
          case "IHDR" =>
            require(len >= 13, s"media ${item.mediaId}: IHDR too short")
            width = be32(p, pos + 8); height = be32(p, pos + 12)
            val bitDepth = p(pos + 16) & 0xff; colorType = p(pos + 17) & 0xff
            val interlace = p(pos + 20) & 0xff
            checkDims(item.mediaId, width, height)
            require(bitDepth == 8,
              s"media ${item.mediaId}: only bit depth 8 supported, got $bitDepth")
            require(interlace == 0,
              s"media ${item.mediaId}: Adam7 interlacing unsupported")
            require(colorType == 0 || colorType == 2 || colorType == 3 ||
              colorType == 4 || colorType == 6,
              s"media ${item.mediaId}: unknown color type $colorType")
          case "PLTE" =>
            require(len % 3 == 0, s"media ${item.mediaId}: PLTE not a multiple of 3")
            palette = java.util.Arrays.copyOfRange(p, pos + 8, pos + 8 + len)
          case "IDAT" => idat.write(p, pos + 8, len)
          case "IEND" => done = true
          case _ => // ancillary chunks (tEXt, tIME, gAMA, ...) skip
        }
        pos += 12 + len
      }
      require(width > 0, s"media ${item.mediaId}: no IHDR chunk")
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      }
      if (colorType == 3) require(palette != null,
        s"media ${item.mediaId}: palette image without PLTE chunk")
      val rowBytes = width * channels
      // Inflate the whole scanline stream: height * (1 filter byte + row).
      val raw = new Array[Byte]((rowBytes + 1) * height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      try {
        while (off < raw.length && !inf.finished()) {
          val n = try inf.inflate(raw, off, raw.length - off) catch {
            // corrupt DEFLATE data is a malformed-input refusal, not a
            // checked-exception escape from the decode contract
            case e: java.util.zip.DataFormatException =>
              throw new IllegalArgumentException(
                s"media ${item.mediaId}: corrupt IDAT DEFLATE stream", e)
          }
          require(n > 0, s"media ${item.mediaId}: truncated IDAT stream " +
            s"($off of ${raw.length} raster bytes)")
          off += n
        }
        require(off == raw.length,
          s"media ${item.mediaId}: IDAT inflated to $off of ${raw.length} bytes")
      } finally inf.end()
      // Unfilter scanlines (prev row starts all-zero per spec), then
      // normalize samples to 3-byte RGB.
      val out = new Array[Byte](width * height * 3)
      val cur = new Array[Byte](rowBytes)
      val prev = new Array[Byte](rowBytes)
      var y = 0
      while (y < height) {
        val base = y * (rowBytes + 1)
        val filter = raw(base) & 0xff
        System.arraycopy(raw, base + 1, cur, 0, rowBytes)
        filter match {
          case 0 => // None
          case 1 => // Sub
            var i = channels
            while (i < rowBytes) {
              cur(i) = (cur(i) + cur(i - channels)).toByte; i += 1
            }
          case 2 => // Up
            var i = 0
            while (i < rowBytes) { cur(i) = (cur(i) + prev(i)).toByte; i += 1 }
          case 3 => // Average
            var i = 0
            while (i < rowBytes) {
              val a = if (i >= channels) cur(i - channels) & 0xff else 0
              cur(i) = (cur(i) + ((a + (prev(i) & 0xff)) >> 1)).toByte; i += 1
            }
          case 4 => // Paeth
            var i = 0
            while (i < rowBytes) {
              val a = if (i >= channels) cur(i - channels) & 0xff else 0
              val c = if (i >= channels) prev(i - channels) & 0xff else 0
              cur(i) = (cur(i) + paeth(a, prev(i) & 0xff, c)).toByte; i += 1
            }
          case other =>
            throw new IllegalArgumentException(
              s"media ${item.mediaId}: unknown filter type $other in row $y")
        }
        var x = 0
        while (x < width) {
          val d = (y * width + x) * 3
          colorType match {
            case 0 => // grayscale -> replicate
              val v = cur(x)
              out(d) = v; out(d + 1) = v; out(d + 2) = v
            case 2 =>
              val s = x * 3
              out(d) = cur(s); out(d + 1) = cur(s + 1); out(d + 2) = cur(s + 2)
            case 3 => // palette index -> PLTE RGB triple
              val idx = (cur(x) & 0xff) * 3
              require(idx + 2 < palette.length,
                s"media ${item.mediaId}: palette index ${cur(x) & 0xff} out of range")
              out(d) = palette(idx); out(d + 1) = palette(idx + 1); out(d + 2) = palette(idx + 2)
            case 4 => // gray + alpha -> replicate gray, drop alpha
              val v = cur(x * 2)
              out(d) = v; out(d + 1) = v; out(d + 2) = v
            case 6 => // RGBA -> drop alpha
              val s = x * 4
              out(d) = cur(s); out(d + 1) = cur(s + 1); out(d + 2) = cur(s + 2)
          }
          x += 1
        }
        System.arraycopy(cur, 0, prev, 0, rowBytes)
        y += 1
      }
      PixelImage(width, height, out)
    }
  }

  /** PNG encoder (RGB, color type 2, bit depth 8) — the write half of
    * the PNG path: a thumbnail/raster sink and the round-trip fixture
    * generator for the decoder's tests and gated queries. `filterForRow`
    * picks each scanline's filter type (0-4); the samples are filtered
    * exactly per RFC 2083 and deflated with java.util.zip.Deflater, so
    * decode(encode(img)) is byte-exact for any filter choice — which is
    * what lets a gated query prove real DEFLATE + unfilter work against
    * a closed-form oracle. */
  object PngEncoder extends Serializable {
    private def crc32(bytes: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32()
      c.update(bytes, off, len)
      c.getValue.toInt
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    def encode(img: PixelImage, filterForRow: Int => Int = _ => 0): Array[Byte] = {
      val rowBytes = img.width * 3
      val raw = new Array[Byte]((rowBytes + 1) * img.height)
      val prev = new Array[Byte](rowBytes)
      var y = 0
      while (y < img.height) {
        val f = filterForRow(y)
        require(f >= 0 && f <= 4, s"filter type $f out of range")
        val base = y * (rowBytes + 1)
        raw(base) = f.toByte
        var i = 0
        while (i < rowBytes) {
          val x = img.rgb(y * rowBytes + i) & 0xff
          val a = if (i >= 3) img.rgb(y * rowBytes + i - 3) & 0xff else 0
          val b = prev(i) & 0xff
          val c = if (i >= 3) prev(i - 3) & 0xff else 0
          val filtered = f match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - ((a + b) >> 1)
            case 4 => x - paeth(a, b, c)
          }
          raw(base + 1 + i) = filtered.toByte
          i += 1
        }
        System.arraycopy(img.rgb, y * rowBytes, prev, 0, rowBytes)
        y += 1
      }
      val deflated = {
        val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        d.setInput(raw); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
        d.end()
        buf.toByteArray
      }
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      def chunk(typ: String, data: Array[Byte]): Unit = {
        val body = typ.getBytes("US-ASCII") ++ data
        val bb = java.nio.ByteBuffer.allocate(body.length + 8)
        bb.putInt(data.length).put(body).putInt(crc32(body, 0, body.length))
        out.write(bb.array())
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(img.width).putInt(img.height)
        .put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      chunk("IHDR", ihdr.array())
      chunk("IDAT", deflated)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
  }

  /** Content-sniffing dispatch: real decoders for the formats whose
    * layout is public ("P6" -> PPM, "BM" -> BMP, the PNG signature ->
    * PNG), the deterministic stub for everything codec-dependent — so
    * one `decodeMeta` call serves a mixed-format corpus column. */
  object SniffDecoder extends Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val p = item.payload
      if (p.length >= 2 && p(0) == 'P' && p(1) == '6') PpmDecoder.decode(item)
      else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') BmpDecoder.decode(item)
      else if (PngDecoder.isPng(p)) PngDecoder.decode(item)
      else if (Jpeg.JpegDecoder.isJpeg(p)) Jpeg.JpegDecoder.decode(item)
      else if (Mp4.isMp4(p)) Mp4.Mp4MetaDecoder.decode(item)
      else if (Avi.isAvi(p)) Avi.AviMetaDecoder.decode(item)
      else if (Gif.GifDecoder.isGif(p)) Gif.GifDecoder.decode(item)
      else if (Tiff.isTiff(p)) Tiff.TiffDecoder.decode(item)
      // metadata walk, not pixel decode: covers lossy/extended/animated
      // WebP (most real web .webp is lossy VP8) — dims from the public
      // headers, pixel decode stays VP8L-only (SniffPixelDecoder)
      else if (Webp.isWebp(p)) Webp.WebpMetaDecoder.decode(item)
      else if (Flac.isFlac(p)) Flac.FlacMetaDecoder.decode(item)
      else if (Mp3.isMp3(p)) Mp3.Mp3MetaDecoder.decode(item)
      else FakeDecoder.decode(item)
    }
  }

  /** Strict metadata dispatch for QUARANTINE passes: the same signature
    * routing as [[SniffDecoder]], but an unknown signature REFUSES
    * instead of falling back to the deterministic stub — a quarantine
    * audit that silently fabricated metadata for undecodable blobs
    * would count garbage as healthy corpus. */
  object SniffMetaDecoder extends Decoder {
    override def decode(item: MediaItem): MediaMeta = {
      val p = item.payload
      if (p.length >= 2 && p(0) == 'P' && p(1) == '6') PpmDecoder.decode(item)
      else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') BmpDecoder.decode(item)
      else if (PngDecoder.isPng(p)) PngDecoder.decode(item)
      else if (Jpeg.JpegDecoder.isJpeg(p)) Jpeg.JpegDecoder.decode(item)
      else if (Mp4.isMp4(p)) Mp4.Mp4MetaDecoder.decode(item)
      else if (Avi.isAvi(p)) Avi.AviMetaDecoder.decode(item)
      else if (Gif.GifDecoder.isGif(p)) Gif.GifDecoder.decode(item)
      else if (Tiff.isTiff(p)) Tiff.TiffDecoder.decode(item)
      else if (Webp.isWebp(p)) Webp.WebpMetaDecoder.decode(item)
      else if (Flac.isFlac(p)) Flac.FlacMetaDecoder.decode(item)
      else if (Mp3.isMp3(p)) Mp3.Mp3MetaDecoder.decode(item)
      else if (Adpcm.isWave(p)) Adpcm.WaveMetaDecoder.decode(item)
      else throw new IllegalArgumentException(
        s"media ${item.mediaId}: no metadata decoder for this signature")
    }
  }

  /** Pixel-level dispatch: the mixed-corpus reality — one binary column
    * holding whatever formats the crawl produced, routed by signature
    * to the right REAL decoder. Formats without a pixel path (MP4/MP3
    * are metadata-only, unknown bytes have no decoder) are refused:
    * a pixel-stats pass silently faking rasters would corrupt corpus
    * statistics, so dispatch fails loudly instead. */
  object SniffPixelDecoder extends PixelDecoder {
    override def decodePixels(item: MediaItem): PixelImage = {
      val p = item.payload
      if (p.length >= 2 && p(0) == 'P' && p(1) == '6') PpmDecoder.decodePixels(item)
      else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') BmpDecoder.decodePixels(item)
      else if (PngDecoder.isPng(p)) PngDecoder.decodePixels(item)
      else if (Jpeg.JpegDecoder.isJpeg(p)) Jpeg.JpegDecoder.decodePixels(item)
      else if (Gif.GifDecoder.isGif(p)) Gif.GifDecoder.decodePixels(item)
      else if (Tiff.isTiff(p)) Tiff.TiffDecoder.decodePixels(item)
      else if (Webp.isWebp(p)) Webp.WebpDecoder.decodePixels(item)
      else throw new IllegalArgumentException(
        s"media ${item.mediaId}: no pixel decoder for this signature")
    }
  }

  /** Deterministic BMP fixture writer (BITMAPINFOHEADER, 24-bit,
    * top-down via negative height) — the PngEncoder/GifEncoder pattern
    * for the uncompressed Windows DIB layout. */
  object BmpEncoder extends Serializable {
    def encode(img: PixelImage): Array[Byte] = {
      val rowSize = ((img.width * 3) + 3) & ~3
      val total = 54 + rowSize * img.height
      val b = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
      b.putInt(40).putInt(img.width).putInt(-img.height) // top-down
      b.putShort(1).putShort(24).putInt(0).putInt(rowSize * img.height)
      b.putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val s = (y * img.width + x) * 3
          b.put(img.rgb(s + 2)).put(img.rgb(s + 1)).put(img.rgb(s)) // BGR
          x += 1
        }
        var pad = rowSize - img.width * 3
        while (pad > 0) { b.put(0.toByte); pad -= 1 }
        y += 1
      }
      b.array()
    }
  }

  /** Nearest-neighbor resize — the thumbnail / fixed-input-size step
    * before a vision encoder. Floor index mapping: output pixel (x, y)
    * samples source pixel (x*W div outW, y*H div outH). Pure integer
    * index math and byte copies: byte-exact across JVMs, partitionings,
    * and runs (no FP interpolation to drift). Works for both down- and
    * up-scaling (upscale replicates source pixels). */
  def resize(img: PixelImage, outW: Int, outH: Int): PixelImage = {
    require(outW > 0 && outH > 0, s"resize target must be positive, got ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * outW + x) * 3
        out(d) = img.rgb(s)
        out(d + 1) = img.rgb(s + 1)
        out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    PixelImage(outW, outH, out)
  }

  /** Integer Rec.601 luma (sum, min, max) over a raster — shared by the
    * full-image and thumbnail stat paths so the two can't drift. */
  private def lumaStats(img: PixelImage): (Long, Int, Int) = {
    var i = 0
    var sum = 0L
    var mn = 255
    var mx = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xff
      val g = img.rgb(i + 1) & 0xff
      val bl = img.rgb(i + 2) & 0xff
      val luma = (299 * r + 587 * g + 114 * bl) / 1000
      sum += luma
      if (luma < mn) mn = luma
      if (luma > mx) mx = luma
      i += 3
    }
    (sum, mn, mx)
  }

  /** Per-image REAL pixel statistics (integer-luma mean/min/max over
    * decoded RGB). Same scale shape as decodeMeta: partition-local
    * decode inside mapPartitions, only small stat rows leave the
    * executor. Luma uses the integer Rec.601 weights so the mean is
    * one exact integer sum + a single IEEE division — deterministic
    * under any partitioning. */
  final case class PixelStats(
      mediaId: Long, width: Int, height: Int,
      meanLuma: Double, minLuma: Int, maxLuma: Int)

  def pixelStats(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: PixelDecoder): Dataset[PixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = decoder.decodePixels(MediaItem(id, bytes))
        val (sum, mn, mx) = lumaStats(img)
        val nPix = img.width.toLong * img.height
        PixelStats(id, img.width, img.height, sum.toDouble / nPix, mn, mx)
      })
  }

  /** A decoded PCM clip: interleaved 16-bit samples as read from the
    * data chunk (frames = samples.length / channels). */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** REAL RIFF/WAVE PCM decoder — the audio format whose byte layout is
    * fully public, the WAV analogue of PpmDecoder/BmpDecoder: "RIFF"
    * size "WAVE", then a chunk walk (id + LE size + payload, word-
    * aligned) to the "fmt " chunk (must be PCM, 16-bit) and the "data"
    * chunk (interleaved LE int16 samples). Compressed codecs (MP3/AAC/
    * Opus) stay behind the documented stub — this decodes actual bytes
    * for the layout that needs no codec library. */
  object WavDecoder extends Serializable {
    def decodeAudio(item: MediaItem): PcmAudio = {
      val p = item.payload
      val b = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(p.length >= 12 &&
        p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E',
        s"media ${item.mediaId}: not a RIFF/WAVE file")
      var pos = 12
      var sampleRate = -1
      var channels = -1
      var samples: Array[Short] = null
      while (pos + 8 <= p.length && (sampleRate < 0 || samples == null)) {
        val id = new String(p, pos, 4, "US-ASCII")
        val size = b.getInt(pos + 4)
        // int-overflow-safe bound: p.length - pos - 8 >= 0 here (loop
        // guard), so a forged size near Int.MaxValue fails instead of
        // wrapping pos negative / allocating a ~2 GB sample array
        require(size >= 0 && size <= p.length - pos - 8,
          s"media ${item.mediaId}: chunk '$id' overruns the payload")
        id match {
          case "fmt " =>
            require(size >= 16, s"media ${item.mediaId}: fmt chunk too short")
            val audioFormat = b.getShort(pos + 8)
            channels = b.getShort(pos + 10)
            sampleRate = b.getInt(pos + 12)
            val bits = b.getShort(pos + 22)
            require(audioFormat == 1 && bits == 16,
              s"media ${item.mediaId}: only 16-bit PCM supported " +
                s"(format=$audioFormat, bits=$bits)")
            require(channels > 0 && sampleRate > 0,
              s"media ${item.mediaId}: invalid fmt (channels=$channels, rate=$sampleRate)")
          case "data" =>
            require(sampleRate > 0,
              s"media ${item.mediaId}: data chunk before fmt chunk")
            val n = size / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = b.getShort(pos + 8 + i * 2); i += 1 }
            samples = out
          case _ => // skip LIST/INFO/fact/junk chunks
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      require(samples != null, s"media ${item.mediaId}: no data chunk")
      PcmAudio(sampleRate, channels, samples)
    }
  }

  /** Per-clip REAL audio statistics over decoded PCM: frame count,
    * integer duration, peak amplitude, mean-square level (exact Long
    * sum of squares, one IEEE division — deterministic under any
    * partitioning, same discipline as lumaStats), and the count of
    * near-full-scale samples (|s| >= clipAt, the clipping screen an
    * audio-ingest quality gate runs). Partition-local decode inside
    * mapPartitions; only skinny stat rows leave the executor. */
  final case class AudioStats(
      mediaId: Long, sampleRate: Int, channels: Int, nFrames: Long,
      durationMs: Long, peak: Int, meanSquare: Double, nClip: Long)

  def audioStats(df: DataFrame, idCol: String, payloadCol: String,
      clipAt: Int = 2000): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val a = WavDecoder.decodeAudio(MediaItem(id, bytes))
        var i = 0
        var sumSq = 0L
        var peak = 0
        var nClip = 0L
        while (i < a.samples.length) {
          val s = a.samples(i).toInt
          val mag = math.abs(s)
          sumSq += s.toLong * s
          if (mag > peak) peak = mag
          if (mag >= clipAt) nClip += 1
          i += 1
        }
        val n = a.samples.length
        val frames = n.toLong / a.channels
        AudioStats(id, a.sampleRate, a.channels, frames,
          frames * 1000L / a.sampleRate, peak,
          if (n == 0) 0.0 else sumSq.toDouble / n, nClip)
      })
  }

  /** 63-bit energy-gradient AUDIO fingerprint — the PCM analogue of the
    * image dHash: the sample stream is cut into 2-sample windows, each
    * window's integer energy (sum of squares, exact int64) computed,
    * and one bit per adjacent-window comparison (right > left). Small
    * amplitude edits or re-encodes flip only the bits whose windows
    * they touch, so near-copies land within a few bits while unrelated
    * audio differs in ~half. The 63 bits ship as two halves (bits 0-31
    * / 32-62) for the same cross-engine int64 sign/shift reasons as
    * [[DHash]]. Partition-local decode; only skinny rows leave. */
  final case class AudioFingerprint(mediaId: Long, nWindows: Int, fpHi: Long, fpLo: Long)

  def audioFingerprint(df: DataFrame, idCol: String, payloadCol: String):
      Dataset[AudioFingerprint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val a = WavDecoder.decodeAudio(MediaItem(id, bytes))
        val nw = a.samples.length / 2
        val e = new Array[Long](nw)
        var w = 0
        while (w < nw) {
          val s0 = a.samples(2 * w).toLong
          val s1 = a.samples(2 * w + 1).toLong
          e(w) = s0 * s0 + s1 * s1
          w += 1
        }
        var hi = 0L
        var lo = 0L
        var b = 0
        while (b < nw - 1 && b < 63) {
          if (e(b + 1) > e(b)) {
            if (b < 32) hi |= 1L << b else lo |= 1L << (b - 32)
          }
          b += 1
        }
        AudioFingerprint(id, nw, hi, lo)
      })
  }

  /** Thumbnail pipeline stage: decode -> nearest-neighbor resize -> luma
    * stats of the thumbnail, all partition-local inside one
    * mapPartitions pass; only the small stat rows leave the executor
    * (the resized rasters never shuffle — a sink that needs the bytes
    * writes them from inside the partition). */
  final case class ThumbStats(
      mediaId: Long, srcWidth: Int, srcHeight: Int,
      outWidth: Int, outHeight: Int,
      meanLuma: Double, minLuma: Int, maxLuma: Int)

  def thumbnailStats(df: DataFrame, idCol: String, payloadCol: String,
      decoder: PixelDecoder, outW: Int, outH: Int): Dataset[ThumbStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val src = decoder.decodePixels(MediaItem(id, bytes))
        val thumb = resize(src, outW, outH)
        val (sum, mn, mx) = lumaStats(thumb)
        ThumbStats(id, src.width, src.height, outW, outH,
          sum.toDouble / (outW.toLong * outH), mn, mx)
      })
  }

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint: decode, nearest-neighbor resize to a 9x8 luma grid,
    * then one bit per horizontally adjacent pair (right > left). Scale
    * or pixel-doubling changes map to the same grid, so re-encoded /
    * resized copies of an image collide — the image analogue of dd01's
    * content-hash dedup (exact-byte md5 can't see those).
    *
    * The 64 bits ship as TWO 32-bit halves (rows 0-3 / rows 4-7):
    * bit 63 of a single int64 would be its sign bit, and int64 shift
    * semantics at position 63 differ across engines — two positive
    * int32-range values compare/group identically everywhere.
    * Partition-local like every decoder path: only (id, w, h, hi, lo)
    * rows leave the executor. */
  final case class DHash(
      mediaId: Long, srcWidth: Int, srcHeight: Int, dhashHi: Long, dhashLo: Long)

  /** The 64 gradient bits of an already-decoded image, as two 32-bit
    * halves. Shared by the standalone hash path and the composed
    * mediaProfile pass so the two cannot drift. */
  private def dhashBits(src: PixelImage): (Long, Long) = {
    val g = resize(src, 9, 8)
    def luma(x: Int, y: Int): Int = {
      val i = (y * 9 + x) * 3
      (299 * (g.rgb(i) & 0xff) + 587 * (g.rgb(i + 1) & 0xff) +
        114 * (g.rgb(i + 2) & 0xff)) / 1000
    }
    var hi = 0L
    var lo = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(x + 1, y) > luma(x, y)) {
          if (y < 4) hi |= 1L << (y * 8 + x)
          else lo |= 1L << ((y - 4) * 8 + x)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  def dhash64(df: DataFrame, idCol: String, payloadCol: String,
      decoder: PixelDecoder): Dataset[DHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val src = decoder.decodePixels(MediaItem(id, bytes))
        val (hi, lo) = dhashBits(src)
        DHash(id, src.width, src.height, hi, lo)
      })
  }

  /** The composed per-image profile a media pipeline actually wants:
    * decode ONCE, derive everything — dimensions, full-image luma
    * stats, perceptual dHash, thumbnail luma stats — in one
    * mapPartitions pass. At 100 TB the decode dominates every
    * downstream feature by orders of magnitude, so running mm01/mm03/
    * mm04/mm05 as separate scans would decode the corpus four times;
    * this emits all four feature families from a single decode while
    * each stays individually available for pipelines that need one. */
  final case class MediaProfile(
      mediaId: Long, width: Int, height: Int,
      meanLuma: Double, dhashHi: Long, dhashLo: Long, thumbMeanLuma: Double)

  def mediaProfile(df: DataFrame, idCol: String, payloadCol: String,
      decoder: PixelDecoder, thumbW: Int, thumbH: Int): Dataset[MediaProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val src = decoder.decodePixels(MediaItem(id, bytes))
        val (sum, _, _) = lumaStats(src)
        val (hi, lo) = dhashBits(src)
        val thumb = resize(src, thumbW, thumbH)
        val (tSum, _, _) = lumaStats(thumb)
        MediaProfile(id, src.width, src.height,
          sum.toDouble / (src.width.toLong * src.height), hi, lo,
          tSum.toDouble / (thumbW.toLong * thumbH))
      })
  }

  /** One profile row per payload with DECODE QUARANTINE — the
    * PERMISSIVE bad-record discipline (ing14's text-format contract)
    * applied to media: a corrupt blob yields an `ok=false` row carrying
    * the refusal class instead of failing the task and with it the
    * whole 100 TB job. Good rows carry the same single-decode feature
    * set as [[mediaProfile]]; zeroed fields on quarantined rows keep
    * the schema flat (no nullable structs to split downstream). */
  final case class MediaProfileSafe(
      mediaId: Long, ok: Boolean, err: String,
      width: Int, height: Int, meanLuma: Double,
      dhashHi: Long, dhashLo: Long, thumbMeanLuma: Double)

  def mediaProfileQuarantine(df: DataFrame, idCol: String, payloadCol: String,
      decoder: PixelDecoder, thumbW: Int, thumbH: Int): Dataset[MediaProfileSafe] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val src = decoder.decodePixels(MediaItem(id, bytes))
          val (sum, _, _) = lumaStats(src)
          val (hi, lo) = dhashBits(src)
          val thumb = resize(src, thumbW, thumbH)
          val (tSum, _, _) = lumaStats(thumb)
          MediaProfileSafe(id, ok = true, err = "",
            src.width, src.height, sum.toDouble / (src.width.toLong * src.height),
            hi, lo, tSum.toDouble / (thumbW.toLong * thumbH))
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaProfileSafe(id, ok = false, err = e.getClass.getSimpleName,
              0, 0, 0.0, 0L, 0L, 0.0)
        }
      })
  }

  /** [[MediaProfileSafe]]'s metadata twin: one row per payload whatever
    * arrives — a decodable blob carries its typed metadata, a corrupt
    * or unknown-signature one lands as ok=false with the refusal class,
    * zeroed fields keeping the schema flat. */
  final case class MediaMetaSafe(
      mediaId: Long, ok: Boolean, err: String,
      byteLen: Int, width: Int, height: Int, frameCount: Int)

  /** Decode QUARANTINE over the metadata dispatch — the mm20 discipline
    * applied to the audio/video/container family: corrupt MP4/MP3/FLAC/
    * AVI (or any sniffed format) blobs land as per-class ok=false rows
    * in ONE partition-local pass, never failing the task. */
  def decodeMetaQuarantine(df: DataFrame, idCol: String, payloadCol: String,
      decoder: Decoder = SniffMetaDecoder): Dataset[MediaMetaSafe] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val m = decoder.decode(MediaItem(id, bytes))
          MediaMetaSafe(id, ok = true, err = "",
            m.byteLen, m.width, m.height, m.frameCount)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaMetaSafe(id, ok = false, err = e.getClass.getSimpleName,
              bytes.length, 0, 0, 0)
        }
      })
  }

  /** Batch decode: binary payload column -> typed metadata Dataset.
    * Partition-parallel, streaming, no collect. */
  def decodeMeta(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder.decode(MediaItem(id, bytes)) })
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `step`-th frame). The explode happens on metadata, not payload —
    * the payload is only re-joined for the frames actually sampled. */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.select(col("mediaId"), col("contentHash"), col("frameCount"),
        explode(sequence(lit(0), col("frameCount") - 1, lit(step))).as("frame_idx"))
      .withColumn("frame_fp", md5(concat(col("contentHash"), lit(":"), col("frame_idx"))))

  /** Feature extraction stub: payload -> dense embedding. The real model
    * inference (vision/audio encoder) is STUBBED with a deterministic
    * md5-seeded pseudo-embedding; the Spark plumbing — partition-local
    * batched extraction, Array[Float] column shape, downstream ANN
    * compatibility (graft.queries.SimilarityQueries / ops.Dedup dd08
    * consume exactly this column type) — is real. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5") // one per partition
        it.map { case (id, bytes) =>
          // counter-mode expansion: block b = md5(payload ++ b) -> 16 floats
          val vec = new Array[Float](dim)
          var b = 0
          while (b * 16 < dim) {
            md.reset(); md.update(bytes); md.update(b.toByte)
            val digest = md.digest()
            var j = 0
            while (j < 16 && b * 16 + j < dim) {
              vec(b * 16 + j) = ((digest(j) & 0xff) - 128) / 128.0f
              j += 1
            }
            b += 1
          }
          (id, vec)
        }
      }
      .toDF(idCol, "embedding")
  }
}
