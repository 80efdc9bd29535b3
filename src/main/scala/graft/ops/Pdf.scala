package graft.ops

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import graft.domain.IngestionError.ParseError

/** Minimal pure-JVM PDF TEXT extraction (ISO 32000-1 subset) — closes
  * the reference's advertised-but-unimplemented format: `.pdf` is listed
  * in /root/reference/instructions.md:8 and exercised by
  * dev-test.sh:109-168, but parser_adapter.rs:54-57 just errors. This
  * implements the 90% case a lake ingest actually sees:
  *
  *  - classic cross-reference TABLES (`xref` sections, `/Prev` chains
  *    from incremental updates — newest entry wins);
  *  - uncompressed and `/FlateDecode` content streams (java.util.zip);
  *  - text shown via `Tj`, `'`, `"`, and `TJ` inside `BT`/`ET`, with
  *    `Td`/`TD`/`T*`/quote-show ops treated as line breaks — the deterministic
  *    layout-free reading order;
  *  - literal strings with the full escape set (\n \r \t \b \f \( \)
  *    \\ \ddd, line continuations) and hex strings, decoded as
  *    Latin-1 (PDFDocEncoding's printable range).
  *
  * Everything outside the subset REFUSES with an instructive error
  * instead of extracting wrong text: encrypted documents (`/Encrypt`),
  * PDF 1.5+ compressed xref/object streams, and non-Flate filters.
  *
  * [[synthesize]] is the matching deterministic writer (fixtures for
  * ing22/ParserSpec) — the round-trip is part of the test surface.
  */
object Pdf {

  final case class PageText(page: Int, text: String)

  // ------------------------------------------------------------ object model
  private sealed trait PObj
  private case class PNum(v: Double) extends PObj { def toInt: Int = v.toInt }
  private case class PName(v: String) extends PObj
  private case class PStr(bytes: Array[Byte]) extends PObj
  private case class PBool(v: Boolean) extends PObj
  private case object PNull extends PObj
  private case class PArr(items: Vector[PObj]) extends PObj
  private case class PDict(m: Map[String, PObj]) extends PObj
  private case class PRef(num: Int, gen: Int) extends PObj
  private case class PStream(dict: PDict, data: Array[Byte]) extends PObj
  private case class POp(name: String) extends PObj // content-stream operator

  // ------------------------------------------------------------ lexer/parser
  private final class Lexer(bytes: Array[Byte], var pos: Int) {
    def len: Int = bytes.length
    private def ws(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
    private def delim(b: Byte): Boolean =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'
    def skipWs(): Unit = {
      while (pos < len && (ws(bytes(pos)) || bytes(pos) == '%')) {
        if (bytes(pos) == '%') { // comment to EOL
          while (pos < len && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
        } else pos += 1
      }
    }
    def peek: Int = if (pos < len) bytes(pos) & 0xff else -1
    def matches(s: String): Boolean =
      pos + s.length <= len && (0 until s.length).forall(i => bytes(pos + i) == s.charAt(i).toByte)
    def expect(s: String): Unit = {
      skipWs()
      if (!matches(s)) throw ParseError(
        s"PDF: expected '$s' at byte $pos, found '${preview()}'")
      pos += s.length
    }
    def preview(): String =
      new String(bytes, pos, math.min(24, len - pos), "ISO-8859-1").replaceAll("\\s+", " ")

    /** One object (or a bare operator keyword in content streams). */
    def next(): PObj = {
      skipWs()
      if (pos >= len) throw ParseError("PDF: unexpected end of data")
      val b = bytes(pos)
      b match {
        case '/' =>
          pos += 1
          val sb = new StringBuilder
          def isHex(b: Byte): Boolean = {
            val c = (b & 0xff).toChar
            (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
          }
          while (pos < len && !ws(bytes(pos)) && !delim(bytes(pos))) {
            // a '#' NOT followed by two hex digits is kept literal (the
            // lenient reading most viewers apply) instead of crashing
            if (bytes(pos) == '#' && pos + 2 < len &&
                isHex(bytes(pos + 1)) && isHex(bytes(pos + 2))) {
              sb.append(Integer.parseInt(
                new String(bytes, pos + 1, 2, "ISO-8859-1"), 16).toChar)
              pos += 3
            } else { sb.append((bytes(pos) & 0xff).toChar); pos += 1 }
          }
          PName(sb.toString)
        case '(' => litString()
        case '<' =>
          if (pos + 1 < len && bytes(pos + 1) == '<') { pos += 2; dict() }
          else hexString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[PObj]
          skipWs()
          while (peek != ']') { items += next(); skipWs() }
          pos += 1
          PArr(items.result())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          val start = pos
          pos += 1
          while (pos < len && ((bytes(pos) >= '0' && bytes(pos) <= '9') || bytes(pos) == '.')) pos += 1
          val numStr = new String(bytes, start, pos - start, "ISO-8859-1")
          val n = try numStr.toDouble catch {
            // a bare sign / '.' / multi-dot run ("1.2.3") is malformed
            case _: NumberFormatException =>
              throw ParseError(s"PDF: malformed number '$numStr' at byte $start")
          }
          // `num gen R` lookahead → indirect reference
          val save = pos
          skipWs()
          if (pos < len && bytes(pos) >= '0' && bytes(pos) <= '9' && n == math.floor(n) && n >= 0) {
            val gs = pos
            while (pos < len && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
            val genStr = new String(bytes, gs, pos - gs, "ISO-8859-1")
            val gen = try genStr.toInt catch {
              case _: NumberFormatException =>
                throw ParseError(s"PDF: generation number '$genStr' out of range")
            }
            skipWs()
            if (pos < len && bytes(pos) == 'R' &&
                (pos + 1 >= len || ws(bytes(pos + 1)) || delim(bytes(pos + 1)))) {
              pos += 1
              return PRef(n.toInt, gen)
            }
          }
          pos = save
          PNum(n)
        case _ =>
          val start = pos
          while (pos < len && !ws(bytes(pos)) && !delim(bytes(pos))) pos += 1
          new String(bytes, start, pos - start, "ISO-8859-1") match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case kw if kw.nonEmpty => POp(kw)
            case _ => throw ParseError(s"PDF: unparsable token at byte $start")
          }
      }
    }

    private def litString(): PStr = {
      pos += 1 // (
      val out = mutable.ArrayBuilder.make[Byte]
      var depth = 1
      while (depth > 0) {
        if (pos >= len) throw ParseError("PDF: unterminated literal string")
        val c = bytes(pos)
        c match {
          case '\\' =>
            pos += 1
            // a backslash as the FINAL byte would read past the buffer —
            // same malformed-input class as an unclosed paren
            if (pos >= len) throw ParseError("PDF: unterminated literal string")
            val e = bytes(pos)
            e match {
              case 'n' => out += '\n'; pos += 1
              case 'r' => out += '\r'; pos += 1
              case 't' => out += '\t'; pos += 1
              case 'b' => out += '\b'; pos += 1
              case 'f' => out += '\f'; pos += 1
              case '(' => out += '('; pos += 1
              case ')' => out += ')'; pos += 1
              case '\\' => out += '\\'; pos += 1
              case '\r' => pos += 1; if (pos < len && bytes(pos) == '\n') pos += 1 // continuation
              case '\n' => pos += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && pos < len && bytes(pos) >= '0' && bytes(pos) <= '7') {
                  v = v * 8 + (bytes(pos) - '0'); pos += 1; k += 1
                }
                out += v.toByte
              case other => out += other; pos += 1
            }
          case '(' => depth += 1; out += '('; pos += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out += ')'
            pos += 1
          case other => out += other; pos += 1
        }
      }
      PStr(out.result())
    }

    private def hexString(): PStr = {
      pos += 1 // <
      val hex = new StringBuilder
      while (pos < len && bytes(pos) != '>') {
        val c = (bytes(pos) & 0xff).toChar
        if (!ws(bytes(pos))) hex.append(c)
        pos += 1
      }
      pos += 1
      if (hex.length % 2 == 1) hex.append('0')
      val s = hex.toString
      if (!s.forall(c => (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
          || (c >= 'A' && c <= 'F')))
        throw ParseError("PDF: non-hex character in hex string")
      PStr(s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray)
    }

    private def dict(): PDict = {
      val m = Map.newBuilder[String, PObj]
      skipWs()
      while (!matches(">>")) {
        next() match {
          case PName(k) => m += (k -> next())
          case other => throw ParseError(s"PDF: dict key must be a name, got $other")
        }
        skipWs()
      }
      pos += 2
      PDict(m.result())
    }
  }

  // ------------------------------------------------------------ document
  private final class Doc(bytes: Array[Byte]) {
    if (bytes.length < 8 || new String(bytes, 0, 5, "ISO-8859-1") != "%PDF-")
      throw ParseError("PDF: missing %PDF- header")

    private var trailerDict: Map[String, PObj] = Map.empty

    private val objOffsets: Map[Int, Long] = {
      // startxref from the tail
      val tail = new String(bytes, math.max(0, bytes.length - 2048),
        math.min(2048, bytes.length), "ISO-8859-1")
      val i = tail.lastIndexOf("startxref")
      if (i < 0) throw ParseError("PDF: no startxref")
      val off = tail.substring(i + 9).trim.takeWhile(_.isDigit) match {
        case "" => throw ParseError("PDF: malformed startxref")
        case d if d.length > 18 => throw ParseError("PDF: startxref out of range")
        case d => d.toLong
      }
      val acc = mutable.Map.empty[Int, Long]
      var cur = off
      var guard = 0
      while (cur >= 0 && guard < 64) {
        cur = readXrefTable(cur.toInt, acc)
        guard += 1
      }
      acc.toMap
    }

    /** Parses one classic xref table (+ its trailer); returns /Prev or -1. */
    private def readXrefTable(off: Int, acc: mutable.Map[Int, Long]): Long = {
      if (off < 0 || off >= bytes.length)
        throw ParseError(s"PDF: xref offset $off outside file (${bytes.length} bytes)")
      val lx = new Lexer(bytes, off)
      lx.skipWs()
      if (!lx.matches("xref")) {
        // PDF 1.5+ puts a cross-reference STREAM object here
        if (new String(bytes, off, math.min(32, bytes.length - off), "ISO-8859-1")
            .matches("(?s)\\d+ \\d+ obj.*"))
          throw ParseError("PDF: cross-reference streams (PDF 1.5+ compressed " +
            "xref) are not supported; re-save as classic-xref or extract upstream")
        throw ParseError(s"PDF: expected xref table at byte $off")
      }
      lx.pos += 4
      lx.skipWs()
      while (!lx.matches("trailer")) {
        val start = lx.next() match {
          case PNum(v) => v.toInt
          case o => throw ParseError(s"PDF: bad xref section header: $o")
        }
        val count = lx.next() match {
          case PNum(v) => v.toInt
          case o => throw ParseError(s"PDF: bad xref section count: $o")
        }
        lx.skipWs()
        (0 until count).foreach { k =>
          // a truncated file can end mid-section: the fixed 20-byte
          // entry read must not overrun the buffer
          if (lx.pos + 20 > bytes.length)
            throw ParseError(s"PDF: truncated xref table (entry ${start + k} " +
              s"runs past end of file)")
          val entry = new String(bytes, lx.pos, 20, "ISO-8859-1")
          // newest xref wins: earlier tables in the /Prev chain must not
          // overwrite entries already recorded
          if (entry.charAt(17) == 'n' && !acc.contains(start + k)) {
            val offStr = entry.substring(0, 10).trim
            if (!offStr.forall(_.isDigit) || offStr.isEmpty)
              throw ParseError(s"PDF: malformed xref entry for object ${start + k}")
            acc(start + k) = offStr.toLong
          }
          lx.pos += 20
        }
        lx.skipWs()
      }
      lx.pos += 7
      lx.next() match {
        case PDict(m) =>
          if (trailerDict.isEmpty) trailerDict = m
          if (m.contains("Encrypt"))
            throw ParseError("PDF: encrypted documents are not supported; " +
              "decrypt upstream before ingestion")
          m.get("Prev") match {
            case Some(PNum(p)) => p.toLong
            case _ => -1L
          }
        case o => throw ParseError(s"PDF: trailer must be a dictionary, got $o")
      }
    }

    private val cache = mutable.Map.empty[Int, PObj]

    def obj(num: Int): PObj = cache.getOrElseUpdate(num, {
      val off = objOffsets.getOrElse(num,
        throw ParseError(s"PDF: object $num not in xref")).toInt
      val lx = new Lexer(bytes, off)
      lx.next() match {
        case PNum(n) if n.toInt == num => ()
        case o => throw ParseError(s"PDF: expected object $num at byte $off, got $o")
      }
      lx.next() match { case PNum(_) => (); case o => throw ParseError(s"PDF: bad gen: $o") }
      lx.expect("obj")
      val body = lx.next()
      lx.skipWs()
      body match {
        case d: PDict if lx.matches("stream") =>
          lx.pos += 6
          if (lx.peek == '\r') lx.pos += 1
          if (lx.peek == '\n') lx.pos += 1
          val length = resolve(d.m.getOrElse("Length",
            throw ParseError("PDF: stream without /Length"))) match {
            case PNum(v) => v.toInt
            case o => throw ParseError(s"PDF: bad /Length: $o")
          }
          val data = java.util.Arrays.copyOfRange(bytes, lx.pos, lx.pos + length)
          PStream(d, data)
        case other => other
      }
    })

    def resolve(o: PObj): PObj = o match {
      case PRef(n, _) => resolve(obj(n))
      case other => other
    }

    def trailer(key: String): PObj =
      resolve(trailerDict.getOrElse(key, throw ParseError(s"PDF: trailer missing /$key")))

    /** Page objects in document order (depth-first /Kids walk). */
    def pages(): Vector[PDict] = {
      val root = trailer("Root") match {
        case d: PDict => d
        case o => throw ParseError(s"PDF: /Root is not a dictionary: $o")
      }
      val out = Vector.newBuilder[PDict]
      def walk(node: PObj, depth: Int): Unit = {
        if (depth > 64) throw ParseError("PDF: page tree too deep (cycle?)")
        resolve(node) match {
          case d: PDict => d.m.get("Type").map(resolve) match {
            case Some(PName("Pages")) =>
              resolve(d.m.getOrElse("Kids", PArr(Vector.empty))) match {
                case PArr(kids) => kids.foreach(walk(_, depth + 1))
                case o => throw ParseError(s"PDF: /Kids is not an array: $o")
              }
            case Some(PName("Page")) => out += d
            case t => throw ParseError(s"PDF: unexpected page-tree node type $t")
          }
          case o => throw ParseError(s"PDF: page-tree node is not a dictionary: $o")
        }
      }
      walk(root.m.getOrElse("Pages",
        throw ParseError("PDF: catalog missing /Pages")), 0)
      out.result()
    }

    /** A page's decoded content bytes (all /Contents streams joined). */
    def contentOf(page: PDict): Array[Byte] = {
      val streams = resolve(page.m.getOrElse("Contents", PArr(Vector.empty))) match {
        case PArr(items) => items.map(resolve)
        case one => Vector(resolve(one))
      }
      streams.toArray.flatMap {
        case PStream(d, data) => decode(d, data) ++ Array[Byte]('\n')
        case o => throw ParseError(s"PDF: /Contents entry is not a stream: $o")
      }
    }

    private def decode(d: PDict, data: Array[Byte]): Array[Byte] =
      resolve(d.m.getOrElse("Filter", PNull)) match {
        case PNull => data
        case PName("FlateDecode") => inflate(data)
        case PArr(Vector(PName("FlateDecode"))) => inflate(data)
        case f => throw ParseError(s"PDF: unsupported stream filter $f " +
          "(only FlateDecode and uncompressed streams are supported)")
      }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw ParseError("PDF: truncated FlateDecode stream")
        out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw ParseError(s"PDF: corrupt FlateDecode stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------ extraction
  /** {page, text} rows, pages 1-based, text in deterministic reading
    * order (show ops concatenated; Td, TD, T-star, and quote ops as line breaks). */
  def extract(bytes: Array[Byte]): Seq[PageText] = {
    val doc = new Doc(bytes)
    doc.pages().zipWithIndex.map { case (p, i) =>
      PageText(i + 1, extractText(doc.contentOf(p)))
    }
  }

  private def extractText(content: Array[Byte]): String = {
    val lx = new Lexer(content, 0)
    val stack = mutable.ArrayBuffer.empty[PObj]
    val text = new StringBuilder
    def newline(): Unit =
      if (text.nonEmpty && text.charAt(text.length - 1) != '\n') text.append('\n')
    def show(s: PStr): Unit = text.append(new String(s.bytes, "ISO-8859-1"))
    def showTJ(a: PArr): Unit = a.items.foreach {
      case s: PStr => show(s)
      case _ => () // kerning adjustments: layout, not text
    }
    while ({ lx.skipWs(); lx.pos < lx.len }) {
      lx.next() match {
        case POp(op) =>
          op match {
            case "Tj" => stack.lastOption.foreach { case s: PStr => show(s); case _ => () }
            case "TJ" => stack.lastOption.foreach { case a: PArr => showTJ(a); case _ => () }
            case "'" =>
              newline()
              stack.lastOption.foreach { case s: PStr => show(s); case _ => () }
            case "\"" =>
              newline()
              stack.lastOption.foreach { case s: PStr => show(s); case _ => () }
            case "Td" | "TD" | "T*" => newline()
            case _ => () // all other operators are layout/state
          }
          stack.clear()
        case operand => stack += operand
      }
    }
    text.toString.stripLineEnd.stripPrefix("\n")
  }

  // ------------------------------------------------------------ fixture writer
  /** Deterministic minimal PDF writer — one content stream per page,
    * classic xref, optional FlateDecode. The fixture side of ing22 and
    * the ParserSpec round-trips (extract(synthesize(p)) == p). */
  def synthesize(pages: Seq[String], compress: Boolean = false): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val out = new java.io.ByteArrayOutputStream()
    val offsets = mutable.ArrayBuffer.empty[Long]
    def write(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    def obj(body: => Unit): Unit = { offsets += out.size().toLong; body }
    write("%PDF-1.4\n")
    val nPages = pages.size
    obj { write(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n") }
    val kids = (0 until nPages).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj { write(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n") }
    pages.zipWithIndex.foreach { case (text, i) =>
      val pageNum = 3 + 2 * i
      val contNum = pageNum + 1
      obj { write(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contNum 0 R >> endobj\n") }
      val lines = text.split("\n", -1)
      val body = ("BT /F1 12 Tf 72 720 Td " +
        lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET").getBytes("ISO-8859-1")
      val data = if (!compress) body else {
        val d = new Deflater()
        d.setInput(body); d.finish()
        val buf = new Array[Byte](body.length * 2 + 64)
        val n = d.deflate(buf); d.end()
        java.util.Arrays.copyOf(buf, n)
      }
      obj {
        write(s"$contNum 0 obj << /Length ${data.length}" +
          (if (compress) " /Filter /FlateDecode" else "") + " >>\nstream\n")
        out.write(data)
        write("\nendstream endobj\n")
      }
    }
    val xrefOff = out.size()
    val n = offsets.size + 1
    write(s"xref\n0 $n\n")
    write(f"${0}%010d ${65535}%05d f\r\n")
    offsets.foreach(o => write(f"$o%010d ${0}%05d n\r\n"))
    write(s"trailer << /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
