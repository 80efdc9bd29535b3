package graft.ops

import Multimodal.{MediaItem, MediaMeta, PixelImage}

/** REAL GIF (87a/89a) decode, pure JVM — the format's only "codec" is
  * LZW with variable-width codes (the public algorithm from the spec,
  * ~60 lines), everything else is byte layout: logical screen
  * descriptor, color tables, extension blocks, image descriptors with
  * length-prefixed data sub-blocks. Completes the image-format set
  * (PPM, BMP, PNG, baseline JPEG, GIF); together with WAV, MP4
  * metadata and the audio/video codec stubs, every common
  * training-corpus container now has a real parser.
  *
  * Decodes the FIRST frame to the engine raster (palette resolved to
  * RGB, interlaced row order de-interlaced); later frames of an
  * animation are SKIPPED by sub-block length — no decode — but
  * counted, so `decode` reports the true frameCount the way the MP4
  * path reports sample counts. Local color tables override the global
  * one per frame; transparency is ignored (stats pipelines read
  * composed pixels). */
object Gif {

  object GifDecoder extends Multimodal.PixelDecoder {

    def isGif(p: Array[Byte]): Boolean =
      p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8' &&
        (p(4) == '7' || p(4) == '9') && p(5) == 'a'

    override def decode(item: MediaItem): MediaMeta = {
      val (img, frames) = decodeFirstFrame(item)
      MediaMeta(item.mediaId, item.payload.length,
        java.security.MessageDigest.getInstance("MD5").digest(item.payload)
          .map(b => f"$b%02x").mkString,
        img.width, img.height, frames)
    }

    override def decodePixels(item: MediaItem): PixelImage = decodeFirstFrame(item)._1

    private def decodeFirstFrame(item: MediaItem): (PixelImage, Int) = {
      val p = item.payload
      val id = item.mediaId
      require(isGif(p), s"media $id: not a GIF")
      var pos = 6
      def u8(): Int = {
        require(pos < p.length, s"media $id: GIF truncated")
        val v = p(pos) & 0xFF; pos += 1; v
      }
      def u16(): Int = {
        require(pos + 1 < p.length, s"media $id: GIF truncated")
        val v = (p(pos) & 0xFF) | ((p(pos + 1) & 0xFF) << 8); pos += 2; v
      }
      def advance(n: Int): Int = {
        require(pos + n <= p.length, s"media $id: GIF truncated inside a block")
        val at = pos; pos += n; at
      }

      u16(); u16() // logical screen dims (frames carry their own)
      val packed = u8()
      u8(); u8() // background index, aspect
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val at = advance(n * 3)
        gct = java.util.Arrays.copyOfRange(p, at, at + n * 3)
      }

      var first: PixelImage = null
      var frames = 0
      var done = false
      while (!done) {
        require(pos < p.length, s"media $id: truncated before trailer")
        u8() match {
          case 0x3B => done = true // trailer
          case 0x21 => // extension: label + sub-blocks
            u8()
            var n = u8()
            while (n != 0) { advance(n); n = u8() }
          case 0x2C => // image descriptor
            u16(); u16() // left, top
            val w = u16(); val h = u16()
            Multimodal.checkDims(id, w, h)
            val ip = u8()
            var table = gct
            if ((ip & 0x80) != 0) {
              val n = 2 << (ip & 7)
              val at = advance(n * 3)
              table = java.util.Arrays.copyOfRange(p, at, at + n * 3)
            }
            val interlaced = (ip & 0x40) != 0
            val minCode = u8()
            if (frames > 0 || first != null) {
              // later frames: skip data sub-blocks without decoding
              var n = u8()
              while (n != 0) { advance(n); n = u8() }
            } else {
              require(table != null, s"media $id: no color table for first frame")
              // concatenate the data sub-blocks, then LZW-decode
              val data = new java.io.ByteArrayOutputStream()
              var n = u8()
              while (n != 0) { data.write(p, advance(n), n); n = u8() }
              val indices = lzwDecode(data.toByteArray, minCode, w * h, id)
              val rows =
                if (!interlaced) (0 until h).toArray
                else { // 4-pass Adam-style row schedule from the spec
                  val order = new Array[Int](h)
                  var i = 0
                  for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                    var y = start
                    while (y < h) { order(i) = y; i += 1; y += step }
                  }
                  order
                }
              val rgb = new Array[Byte](w * h * 3)
              var i = 0
              while (i < h) {
                val destY = rows(i)
                var x = 0
                while (x < w) {
                  val idx = indices(i * w + x) & 0xFF
                  require(idx * 3 + 2 < table.length,
                    s"media $id: palette index $idx out of range")
                  val d = (destY * w + x) * 3
                  rgb(d) = table(idx * 3)
                  rgb(d + 1) = table(idx * 3 + 1)
                  rgb(d + 2) = table(idx * 3 + 2)
                  x += 1
                }
                i += 1
              }
              first = PixelImage(w, h, rgb)
            }
            frames += 1
          case other =>
            throw new IllegalArgumentException(
              f"media $id: unknown GIF block 0x$other%02X")
        }
      }
      require(first != null, s"media $id: GIF has no image frame")
      (first, frames)
    }

    /** Variable-width LSB-first LZW per the GIF spec appendix. */
    private def lzwDecode(data: Array[Byte], minCode: Int, expected: Int,
                          id: Long): Array[Byte] = {
      val clear = 1 << minCode
      val end = clear + 1
      val out = new java.io.ByteArrayOutputStream(expected)
      // dictionary as (prefixCode, appendedByte); roots are implicit
      val prefix = new Array[Int](4096)
      val append = new Array[Byte](4096)
      var dictSize = clear + 2
      var codeWidth = minCode + 1
      var bitPos = 0
      def read(): Int = {
        var v = 0
        var i = 0
        while (i < codeWidth) {
          val bp = bitPos + i
          require(bp / 8 < data.length, s"media $id: LZW stream truncated")
          v |= (((data(bp / 8) >> (bp % 8)) & 1) << i)
          i += 1
        }
        bitPos += codeWidth
        v
      }
      def expand(code: Int): Array[Byte] = {
        val buf = new scala.collection.mutable.ArrayBuffer[Byte](16)
        var c = code
        while (c >= clear + 2) { buf += append(c); c = prefix(c) }
        buf += c.toByte
        buf.reverseIterator.toArray
      }
      var prev = -1
      var doneLzw = false
      while (!doneLzw && out.size < expected) {
        val code = read()
        if (code == clear) { dictSize = clear + 2; codeWidth = minCode + 1; prev = -1 }
        else if (code == end) doneLzw = true
        else {
          val entry: Array[Byte] =
            if (code < dictSize) expand(code) // root or known dict entry
            else if (code == dictSize && prev >= 0) { val pe = expand(prev); pe :+ pe(0) }
            else throw new IllegalArgumentException(s"media $id: corrupt LZW code $code")
          out.write(entry, 0, entry.length)
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev
            append(dictSize) = entry(0)
            dictSize += 1
            if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prev = code
        }
      }
      require(out.size >= expected, s"media $id: LZW yielded ${out.size} of $expected pixels")
      java.util.Arrays.copyOf(out.toByteArray, expected)
    }
  }

  /** Deterministic fixture writer: GIF89a with a 256-entry grayscale
    * palette (index i -> (i,i,i), so luma == index and oracles are
    * closed-form). LZW strategy: literal codes only, with a CLEAR every
    * 250 literals so the code width stays at 9 bits — valid, simple,
    * and exercises the decoder's dictionary growth + reset paths.
    * `frames` appends extra identical image descriptors (animation). */
  object GifEncoder extends Serializable {
    def encode(width: Int, height: Int, indices: Array[Byte], frames: Int = 1): Array[Byte] = {
      require(indices.length == width * height, "index raster size mismatch")
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      u16(width); u16(height)
      out.write(0x80 | 7) // GCT present, 256 entries
      out.write(0); out.write(0)
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }

      var f = 0
      while (f < frames) {
        out.write(0x2C)
        u16(0); u16(0); u16(width); u16(height)
        out.write(0) // no LCT, not interlaced
        out.write(8) // LZW min code size

        // bit-pack literal codes LSB-first at width 9, CLEAR every 250
        val bits = new java.io.ByteArrayOutputStream()
        var acc = 0L
        var nAcc = 0
        def put(code: Int): Unit = {
          acc |= (code.toLong << nAcc)
          nAcc += 9
          while (nAcc >= 8) { bits.write((acc & 0xFF).toInt); acc >>= 8; nAcc -= 8 }
        }
        put(256) // initial CLEAR
        var k = 0
        while (k < indices.length) {
          if (k > 0 && k % 250 == 0) put(256)
          put(indices(k) & 0xFF)
          k += 1
        }
        put(257) // END
        if (nAcc > 0) bits.write((acc & 0xFF).toInt)
        val lzw = bits.toByteArray
        var off = 0
        while (off < lzw.length) {
          val n = math.min(255, lzw.length - off)
          out.write(n)
          out.write(lzw, off, n)
          off += n
        }
        out.write(0) // block terminator
        f += 1
      }
      out.write(0x3B)
      out.toByteArray
    }
  }
}
