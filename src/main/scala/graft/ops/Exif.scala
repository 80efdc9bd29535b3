package graft.ops

import java.io.ByteArrayOutputStream

/** EXIF metadata for JPEG payloads — the orientation/dims/provenance
  * pass a 100 TB image corpus runs on EVERY file before any decode
  * (orientation-aware thumbnailing, capture-time dedup, camera-model
  * stratification). EXIF is a TIFF IFD embedded in a JPEG APP1 segment
  * (CIPA DC-008 / ITU T.81 marker framing), so the walker here is the
  * metadata twin of ops/Tiff.scala's full decoder: both endiannesses,
  * inline-vs-offset values, nested Exif IFD. Parsing touches only the
  * leading marker segments — never entropy-coded data — so the scan is
  * bytes-of-header, not bytes-of-image.
  *
  * Fixture encoder included ([[app1Segment]]/[[insertApp1]]): the gate
  * inserts a real APP1 into a REAL decodable baseline JPEG, proving
  * the metadata rides the same payload the pixel path decodes.
  */
object Exif {

  /** Parsed EXIF. `orientation` follows the TIFF tag (1 = upright;
    * 5-8 transpose). */
  final case class ExifMeta(
      orientation: Int,
      make: Option[String],
      dateTime: Option[String],
      pixelX: Option[Long],
      pixelY: Option[Long]) {
    /** Display dims after applying the orientation (5-8 swap axes) —
      * what a layout/thumbnail pipeline actually needs. */
    def normalizedDims(w: Int, h: Int): (Int, Int) =
      if (orientation >= 5 && orientation <= 8) (h, w) else (w, h)
  }

  private val ExifPrefix = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  /** Parse the APP1 Exif segment of a JPEG; None when the image has no
    * EXIF (common), error on a malformed one (corrupt corpus rows must
    * surface, not silently read as "no metadata"). */
  def parse(jpeg: Array[Byte]): Option[ExifMeta] = {
    require(jpeg.length >= 4 &&
      (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8, "not a JPEG (no SOI)")
    var pos = 2
    while (pos + 4 <= jpeg.length) {
      require((jpeg(pos) & 0xFF) == 0xFF, s"bad marker at $pos")
      val marker = jpeg(pos + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return None // SOS/EOI: no EXIF seen
      val len = ((jpeg(pos + 2) & 0xFF) << 8) | (jpeg(pos + 3) & 0xFF)
      require(len >= 2 && pos + 2 + len <= jpeg.length, s"bad segment length at $pos")
      if (marker == 0xE1 && len >= 2 + ExifPrefix.length &&
          jpeg.slice(pos + 4, pos + 4 + ExifPrefix.length).sameElements(ExifPrefix)) {
        return Some(parseTiff(jpeg, pos + 4 + ExifPrefix.length,
          pos + 2 + len))
      }
      pos += 2 + len
    }
    None
  }

  private def parseTiff(b: Array[Byte], base: Int, end: Int): ExifMeta = {
    require(end - base >= 8, "truncated EXIF TIFF header")
    val le = (b(base) & 0xFF, b(base + 1) & 0xFF) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case other => throw new IllegalArgumentException(s"bad TIFF byte order $other")
    }
    def u16(off: Int): Int = {
      require(base + off + 2 <= end, s"EXIF read past segment at $off")
      val a = b(base + off) & 0xFF; val c = b(base + off + 1) & 0xFF
      if (le) (c << 8) | a else (a << 8) | c
    }
    def u32(off: Int): Long = {
      require(base + off + 4 <= end, s"EXIF read past segment at $off")
      val x = (0 until 4).map(i => (b(base + off + i) & 0xFFL))
      if (le) (x(3) << 24) | (x(2) << 16) | (x(1) << 8) | x(0)
      else (x(0) << 24) | (x(1) << 16) | (x(2) << 8) | x(3)
    }
    require(u16(2) == 42, "bad TIFF magic in EXIF")

    var orientation = 1
    var make: Option[String] = None
    var dateTime: Option[String] = None
    var pixelX: Option[Long] = None
    var pixelY: Option[Long] = None

    def ascii(off: Int, count: Int): String = {
      val at = if (count <= 4) off + 8 else u32(off + 8).toInt
      require(base + at + count <= end, "EXIF string past segment")
      new String(b, base + at, count, "US-ASCII").takeWhile(_ != '\u0000')
    }
    /** SHORT/LONG scalar — inline, left-justified per TIFF. */
    def scalar(off: Int, typ: Int): Long =
      if (typ == 3) u16(off + 8).toLong else u32(off + 8)

    def walk(ifdOff: Int): Unit = {
      val n = u16(ifdOff)
      (0 until n).foreach { i =>
        val e = ifdOff + 2 + i * 12
        val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4).toInt
        tag match {
          case 0x010F => make = Some(ascii(e, count))
          case 0x0112 => orientation = scalar(e, typ).toInt
          case 0x0132 => dateTime = Some(ascii(e, count))
          case 0x8769 => walk(u32(e + 8).toInt) // nested Exif IFD
          case 0xA002 => pixelX = Some(scalar(e, typ))
          case 0xA003 => pixelY = Some(scalar(e, typ))
          case _ => () // unknown tags skip — forward compatibility
        }
      }
    }
    walk(u32(4).toInt)
    ExifMeta(orientation, make, dateTime, pixelX, pixelY)
  }

  // -------------------------------------------------------------- fixtures

  /** A complete APP1 Exif segment (marker + length + Exif\0\0 + TIFF):
    * IFD0 carries Make / Orientation / DateTime / ExifIFD-pointer; the
    * Exif IFD carries PixelX/YDimension. Either endianness. */
  def app1Segment(orientation: Int, make: String, dateTime: String,
      pixelX: Long, pixelY: Long, littleEndian: Boolean = true): Array[Byte] = {
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val dtB = (dateTime + "\u0000").getBytes("US-ASCII")
    val tiff = new ByteArrayOutputStream()
    def w8(v: Int): Unit = tiff.write(v & 0xFF)
    def w16(v: Int): Unit =
      if (littleEndian) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (littleEndian) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }

    // layout: header(8) | IFD0 2+4*12+4 = 54 -> ends 62 | ExifIFD
    // 2+2*12+4 = 30 -> ends 92 | make | dateTime
    val ifd0 = 8; val exifIfd = 62; val makeOff = 92
    val dtOff = makeOff + makeB.length
    if (littleEndian) { w8('I'); w8('I') } else { w8('M'); w8('M') }
    w16(42); w32(ifd0)
    def entryStr(tag: Int, bytes: Array[Byte], off: Int): Unit = {
      w16(tag); w16(2); w32(bytes.length)
      if (bytes.length <= 4) { // inline, left-justified, zero-padded
        bytes.foreach(x => w8(x)); (bytes.length until 4).foreach(_ => w8(0))
      } else w32(off)
    }
    def entryShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1)
      w16(v); w16(0) // left-justified within the 4 value bytes
    }
    def entryLong(tag: Int, v: Long): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    // IFD0 (tags ascending, per spec)
    w16(4)
    entryStr(0x010F, makeB, makeOff)
    entryShort(0x0112, orientation)
    entryStr(0x0132, dtB, dtOff)
    entryLong(0x8769, exifIfd)
    w32(0)
    // Exif IFD
    w16(2)
    entryLong(0xA002, pixelX)
    entryLong(0xA003, pixelY)
    w32(0)
    tiff.write(makeB); tiff.write(dtB)

    val body = ExifPrefix ++ tiff.toByteArray
    val seg = new ByteArrayOutputStream()
    seg.write(0xFF); seg.write(0xE1)
    val len = body.length + 2
    seg.write((len >> 8) & 0xFF); seg.write(len & 0xFF)
    seg.write(body)
    seg.toByteArray
  }

  /** EXIF parsed from a RAW TIFF payload — the WebP/PNG container
    * shape: the chunk body IS the TIFF stream (an optional "Exif\0\0"
    * prefix from some writers is tolerated). Throws on corrupt bytes —
    * the quarantine dispatches surface that as an ok=false row rather
    * than fabricating metadata. */
  def parsePayload(bytes: Array[Byte]): ExifMeta = {
    val base =
      if (bytes.length >= ExifPrefix.length &&
          bytes.take(ExifPrefix.length).sameElements(ExifPrefix)) ExifPrefix.length
      else 0
    parseTiff(bytes, base, bytes.length)
  }

  /** The raw TIFF block of [[app1Segment]]'s fixture fields — what a
    * WebP EXIF chunk carries (the APP1 wrapper stripped). */
  def tiffPayload(orientation: Int, make: String, dateTime: String,
      pixelX: Long, pixelY: Long, littleEndian: Boolean = true): Array[Byte] =
    app1Segment(orientation, make, dateTime, pixelX, pixelY, littleEndian)
      .drop(4 + ExifPrefix.length)

  /** Insert an APP1 right after SOI — the canonical EXIF position. */
  def insertApp1(jpeg: Array[Byte], seg: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8,
      "not a JPEG")
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }
}
