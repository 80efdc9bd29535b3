package graft.ops

import Multimodal.{MediaItem, PixelImage}

/** REAL baseline TIFF decode, pure JVM — the archival/scan format of
  * document corpora (and the container GeoTIFF/scientific data ships
  * in). The byte layout is public (TIFF 6.0 spec): a 8-byte header
  * (II/MM byte order + magic 42 + first-IFD offset) and a directory of
  * 12-byte entries (tag, type, count, inline-value-or-offset). This
  * decoder handles the uncompressed baseline profile exactly — 8-bit
  * grayscale and RGB, chunky planar layout, any strip segmentation,
  * BOTH byte orders — and refuses everything else (LZW/JPEG/deflate
  * compression, tiles, planar=2, non-8-bit) with a clear error, the
  * same honest-refusal contract as the JPEG/PNG/GIF decoders.
  */
object Tiff {

  def isTiff(p: Array[Byte]): Boolean =
    p.length >= 8 &&
      ((p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||
        (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42))

  object TiffDecoder extends Multimodal.PixelDecoder {
    override def decodePixels(item: MediaItem): PixelImage = {
      val p = item.payload
      val id = item.mediaId
      require(isTiff(p), s"media $id: not a TIFF (bad byte-order/magic)")
      val le = p(0) == 'I'

      def u16(off: Int): Int =
        if (le) (p(off) & 0xFF) | ((p(off + 1) & 0xFF) << 8)
        else ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)
      def u32(off: Int): Long =
        if (le) (p(off) & 0xFFL) | ((p(off + 1) & 0xFFL) << 8) |
          ((p(off + 2) & 0xFFL) << 16) | ((p(off + 3) & 0xFFL) << 24)
        else ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
          ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)

      val ifd = u32(4)
      require(ifd >= 8 && ifd + 2 <= p.length, s"media $id: IFD offset out of range")
      val nEntries = u16(ifd.toInt)
      require(ifd + 2 + nEntries * 12 <= p.length, s"media $id: IFD overruns file")

      // SHORT(3)/LONG(4) scalar-or-array entry values; values <= 4 bytes
      // are inline in the entry, larger live at the offset
      def values(entryOff: Int): Array[Long] = {
        val typ = u16(entryOff + 2)
        val count = u32(entryOff + 4)
        require(typ == 3 || typ == 4,
          s"media $id: unsupported IFD value type $typ (tag ${u16(entryOff)})")
        val elemSize = if (typ == 3) 2 else 4
        require(count <= Int.MaxValue / elemSize, s"media $id: absurd IFD count")
        val total = count.toInt * elemSize
        val base = if (total <= 4) entryOff + 8 else {
          val off = u32(entryOff + 8)
          require(off + total <= p.length, s"media $id: IFD value overruns file")
          off.toInt
        }
        Array.tabulate(count.toInt)(i =>
          if (typ == 3) u16(base + i * 2).toLong else u32(base + i * 4))
      }

      var width, height = 0
      var compression = 1L
      var photometric = -1L
      var samplesPerPixel = 1L
      var rowsPerStrip = Long.MaxValue
      var planar = 1L
      var bits: Array[Long] = Array(8L)
      var stripOffsets: Array[Long] = Array.empty
      var stripCounts: Array[Long] = Array.empty

      var i = 0
      while (i < nEntries) {
        val e = ifd.toInt + 2 + i * 12
        u16(e) match {
          case 256 => width = values(e)(0).toInt
          case 257 => height = values(e)(0).toInt
          case 258 => bits = values(e)
          case 259 => compression = values(e)(0)
          case 262 => photometric = values(e)(0)
          case 273 => stripOffsets = values(e)
          case 277 => samplesPerPixel = values(e)(0)
          case 278 => rowsPerStrip = values(e)(0)
          case 279 => stripCounts = values(e)
          case 284 => planar = values(e)(0)
          case 322 | 323 | 324 | 325 =>
            throw new IllegalArgumentException(s"media $id: tiled TIFF not supported")
          case _ => () // ignore unknown/irrelevant tags (resolution, software, ...)
        }
        i += 1
      }

      require(width > 0 && height > 0, s"media $id: missing TIFF dimensions")
      Multimodal.checkDims(id, width, height)
      require(compression == 1,
        s"media $id: only uncompressed TIFF supported (compression=$compression)")
      require(planar == 1, s"media $id: only chunky planar layout supported")
      require(bits.forall(_ == 8), s"media $id: only 8 bits/sample supported")
      require(photometric == 1 || photometric == 2,
        s"media $id: photometric $photometric not supported (gray/RGB only)")
      val spp = samplesPerPixel.toInt
      require((photometric == 2 && spp == 3) || (photometric == 1 && spp == 1),
        s"media $id: photometric $photometric with $spp samples/pixel")
      require(stripOffsets.nonEmpty && stripOffsets.length == stripCounts.length,
        s"media $id: inconsistent strip tables")

      val rowBytes = width * spp
      val expected = rowBytes.toLong * height
      require(stripCounts.sum == expected,
        s"media $id: strip bytes ${stripCounts.sum} != image bytes $expected")
      val raw = new Array[Byte](expected.toInt)
      var outPos = 0
      var s = 0
      while (s < stripOffsets.length) {
        val off = stripOffsets(s).toInt
        val len = stripCounts(s).toInt
        require(off >= 0 && off.toLong + len <= p.length,
          s"media $id: strip $s overruns file")
        System.arraycopy(p, off, raw, outPos, len)
        outPos += len
        s += 1
      }
      // normalize to the engine's RGB pixel contract
      if (spp == 3) PixelImage(width, height, raw)
      else {
        val rgb = new Array[Byte](width * height * 3)
        var q = 0
        while (q < width * height) {
          val v = raw(q)
          rgb(q * 3) = v; rgb(q * 3 + 1) = v; rgb(q * 3 + 2) = v
          q += 1
        }
        PixelImage(width, height, rgb)
      }
    }
  }

  /** Deterministic fixture writer: header + pixel strips + single IFD.
    * Supports both byte orders, gray/RGB, and a forced strip split so
    * specs can pin multi-strip assembly. */
  object TiffEncoder extends Serializable {
    def encode(img: PixelImage, littleEndian: Boolean = true,
        gray: Boolean = false, rowsPerStrip: Int = Int.MaxValue): Array[Byte] = {
      val spp = if (gray) 1 else 3
      val data: Array[Byte] =
        if (!gray) img.rgb
        else Array.tabulate(img.width * img.height)(i => img.rgb(i * 3))
      val rps = math.min(rowsPerStrip, img.height)
      val nStrips = (img.height + rps - 1) / rps
      val rowBytes = img.width * spp
      val stripLens = Array.tabulate(nStrips)(s =>
        (math.min(rps * (s + 1), img.height) - rps * s) * rowBytes)
      val stripOffs = stripLens.scanLeft(8)(_ + _).init

      val out = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = out.write(v & 0xFF)
      def w16(v: Int): Unit =
        if (littleEndian) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
      def w32(v: Int): Unit =
        if (littleEndian) { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
        else { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }

      val ifdOff = 8 + data.length
      // entries with >4-byte values park them after the IFD
      val nEntries = if (nStrips > 1) 10 else 10
      val ifdSize = 2 + nEntries * 12 + 4
      var extraOff = ifdOff + ifdSize
      val extras = new java.io.ByteArrayOutputStream()

      if (littleEndian) { w8('I'); w8('I'); w8(42); w8(0) }
      else { w8('M'); w8('M'); w8(0); w8(42) }
      w32(ifdOff)
      out.write(data)

      def entry(tag: Int, typ: Int, count: Int, inline: => Unit)(
          arr: => Array[Int] = Array.empty): Unit = {
        w16(tag); w16(typ); w32(count)
        val elemSize = if (typ == 3) 2 else 4
        if (count * elemSize <= 4) {
          val before = out.size(); inline
          var pad = 4 - (out.size() - before); while (pad > 0) { w8(0); pad -= 1 }
        } else {
          w32(extraOff)
          arr.foreach(v => if (typ == 3) {
            if (littleEndian) { extras.write(v & 0xFF); extras.write((v >> 8) & 0xFF) }
            else { extras.write((v >> 8) & 0xFF); extras.write(v & 0xFF) }
          } else {
            val bs = if (littleEndian)
              Array(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF, (v >> 24) & 0xFF)
            else Array((v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
            bs.foreach(extras.write)
          })
          extraOff += count * elemSize
        }
      }

      w16(nEntries)
      entry(256, 3, 1, w16(img.width))()
      entry(257, 3, 1, w16(img.height))()
      if (spp == 3) entry(258, 3, 3, ())(Array(8, 8, 8))
      else entry(258, 3, 1, w16(8))()
      entry(259, 3, 1, w16(1))()                     // uncompressed
      entry(262, 3, 1, w16(if (gray) 1 else 2))()    // photometric
      if (nStrips > 1) entry(273, 4, nStrips, ())(stripOffs)
      else entry(273, 4, 1, w32(stripOffs(0)))()
      entry(277, 3, 1, w16(spp))()
      entry(278, 3, 1, w16(math.min(rps, 0xFFFF)))()
      if (nStrips > 1) entry(279, 4, nStrips, ())(stripLens)
      else entry(279, 4, 1, w32(stripLens(0)))()
      entry(284, 3, 1, w16(1))()                     // chunky
      w32(0)                                         // no next IFD
      extras.toByteArray.foreach(out.write(_))
      out.toByteArray
    }
  }
}
