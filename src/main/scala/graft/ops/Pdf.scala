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
  *  - PDF 1.5+ cross-reference STREAMS (`/Type /XRef`: binary [W]-field
  *    rows, `/Index` subsections, PNG-predictor `/DecodeParms`) and
  *    OBJECT STREAMS (`/Type /ObjStm`: the compressed-object containers
  *    most modern writers emit), including hybrid files (`/XRefStm` in
  *    a classic trailer);
  *  - uncompressed and `/FlateDecode` content streams (java.util.zip);
  *  - text shown via `Tj`, `'`, `"`, and `TJ` inside `BT`/`ET`, with
  *    `Td`/`TD`/`T*`/quote-show ops treated as line breaks — the deterministic
  *    layout-free reading order;
  *  - literal strings with the full escape set (\n \r \t \b \f \( \)
  *    \\ \ddd, line continuations) and hex strings, decoded as
  *    Latin-1 (PDFDocEncoding's printable range).
  *
  * Everything outside the subset REFUSES with an instructive error
  * instead of extracting wrong text: encrypted documents (`/Encrypt`)
  * and non-Flate filters.
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

    /** /Encrypt seen during xref reading — the throw is DEFERRED until
      * the object index is complete so the refusal can resolve the
      * encryption dictionary and NAME the algorithm (the class of
      * refusal a web corpus hits most; "encrypted" alone sends the
      * operator hunting). */
    private var encryptObj: Option[PObj] = None

    /** Where an object lives: at a byte offset of the file, or at an
      * index inside a /Type /ObjStm container (PDF 1.5+). */
    private sealed trait XEntry
    private case class InFile(off: Long) extends XEntry
    private case class InStm(stm: Int, idx: Int) extends XEntry

    private val objIndex: Map[Int, XEntry] = {
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
      val acc = mutable.Map.empty[Int, XEntry]
      var cur = off
      var guard = 0
      while (cur >= 0 && guard < 64) {
        cur = readXrefAt(cur.toInt, acc)
        guard += 1
      }
      acc.toMap
    }

    /** Refuse an encrypted document, naming the algorithm per the
      * standard security handler's /V (+ /CF crypt-filter CFM for
      * V4/V5): RC4 40-bit (V1), RC4 /Length-bit (V2), AES-128 (AESV2),
      * AES-256 (AESV3). Resolution is best-effort — a broken or
      * unreachable /Encrypt object still refuses, generically. */
    private def encryptRefusal(e: PObj): Nothing = {
      val dict =
        try resolve(e) match { case d: PDict => Some(d.m); case _ => None }
        catch { case _: ParseError => None }
      val algo = dict.map { m =>
        def num(k: String): Int = m.get(k).map(resolve) match {
          case Some(PNum(v)) => v.toInt
          case _ => -1
        }
        def cfm: String = (for {
          cf <- m.get("CF").map(resolve).collect { case d: PDict => d.m }
          std <- cf.get("StdCF").map(resolve).collect { case d: PDict => d.m }
          n <- std.get("CFM").map(resolve).collect { case PName(n) => n }
        } yield n).getOrElse("")
        num("V") match {
          case 1 => "RC4 40-bit (V1)"
          case 2 => s"RC4 ${if (num("Length") > 0) num("Length") else 40}-bit (V2)"
          case 4 => cfm match {
            case "AESV2" => "AES-128 (V4 AESV2)"
            case "V2" => "RC4-128 (V4 CFM V2)"
            case other => s"V4 crypt filter ${if (other.isEmpty) "unknown" else other}"
          }
          case 5 => cfm match {
            case "" | "AESV3" => "AES-256 (V5 AESV3)"
            case other => s"V5 crypt filter $other"
          }
          case v => s"unknown security handler /V $v"
        }
      }.getOrElse("unresolvable /Encrypt dictionary")
      throw ParseError(s"PDF: encrypted document ($algo) and no password " +
        "available; decrypt upstream before ingestion")
    }

    /** One xref section — classic table or 1.5+ stream — at `off`;
      * returns /Prev or -1. */
    private def readXrefAt(off: Int, acc: mutable.Map[Int, XEntry]): Long = {
      if (off < 0 || off >= bytes.length)
        throw ParseError(s"PDF: xref offset $off outside file (${bytes.length} bytes)")
      val lx = new Lexer(bytes, off)
      lx.skipWs()
      if (lx.matches("xref")) readXrefTable(lx, acc)
      else readXrefStream(off, acc)
    }

    /** Parses one classic xref table (+ its trailer); returns /Prev or -1. */
    private def readXrefTable(lx: Lexer, acc: mutable.Map[Int, XEntry]): Long = {
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
            acc(start + k) = InFile(offStr.toLong)
          }
          lx.pos += 20
        }
        lx.skipWs()
      }
      lx.pos += 7
      lx.next() match {
        case PDict(m) =>
          if (trailerDict.isEmpty) trailerDict = m
          if (m.contains("Encrypt") && encryptObj.isEmpty)
            encryptObj = Some(m("Encrypt")) // refusal deferred + classified
          // HYBRID file: the classic trailer points at a supplementary
          // xref STREAM carrying the compressed-object entries this
          // table cannot express; it complements, never overrides
          m.get("XRefStm") match {
            case Some(PNum(x)) => readXrefStream(x.toInt, acc): Unit
            case _ => ()
          }
          m.get("Prev") match {
            case Some(PNum(p)) => p.toLong
            case _ => -1L
          }
        case o => throw ParseError(s"PDF: trailer must be a dictionary, got $o")
      }
    }

    /** Parses a PDF 1.5+ cross-reference STREAM at `off` (an ordinary
      * `N 0 obj` whose dict is /Type /XRef and whose decoded data is
      * binary [W]-field rows over the /Index subsections); doubles as
      * the trailer. Returns /Prev or -1. */
    private def readXrefStream(off: Int, acc: mutable.Map[Int, XEntry]): Long = {
      if (off < 0 || off >= bytes.length)
        throw ParseError(s"PDF: xref-stream offset $off outside file")
      val (_, body) = parseObjAt(off)
      val stm = body match {
        case s: PStream => s
        case o => throw ParseError(s"PDF: expected a cross-reference stream at " +
          s"byte $off, got $o")
      }
      val d = stm.dict.m
      if (d.contains("Encrypt") && encryptObj.isEmpty)
        encryptObj = Some(d("Encrypt")) // refusal deferred + classified
      val w = d.get("W") match {
        case Some(PArr(ws)) => ws.map {
          case PNum(v) if v >= 0 && v <= 8 => v.toInt
          case o => throw ParseError(s"PDF: bad /W field width $o")
        }
        case o => throw ParseError(s"PDF: xref stream missing /W (got $o)")
      }
      if (w.size != 3) throw ParseError(s"PDF: /W must have 3 widths, got ${w.size}")
      val size = d.get("Size") match {
        case Some(PNum(v)) => v.toInt
        case o => throw ParseError(s"PDF: xref stream missing /Size (got $o)")
      }
      val index: Vector[(Int, Int)] = d.get("Index") match {
        case None => Vector((0, size))
        case Some(PArr(items)) =>
          if (items.size % 2 != 0) throw ParseError("PDF: odd /Index array")
          items.grouped(2).map {
            case Vector(PNum(s), PNum(c)) => (s.toInt, c.toInt)
            case o => throw ParseError(s"PDF: bad /Index pair $o")
          }.toVector
        case o => throw ParseError(s"PDF: /Index is not an array: $o")
      }
      val data = decode(stm.dict, stm.data)
      val rowW = w.sum
      if (rowW == 0) throw ParseError("PDF: /W is all zero")
      val needed = index.map(_._2.toLong).sum * rowW
      if (data.length < needed)
        throw ParseError(s"PDF: xref stream data truncated (${data.length} " +
          s"bytes for $needed expected)")
      var p = 0
      def field(width: Int, default: Long): Long = {
        if (width == 0) return default
        var v = 0L
        var i = 0
        while (i < width) { v = (v << 8) | (data(p + i) & 0xffL); i += 1 }
        p += width
        v
      }
      index.foreach { case (start, count) =>
        (0 until count).foreach { k =>
          val tpe = field(w(0), 1L) // absent type field defaults to 'in use'
          val f2 = field(w(1), 0L)
          val f3 = field(w(2), 0L)
          val id = start + k
          if (!acc.contains(id)) tpe match {
            case 0L => () // free
            case 1L => acc(id) = InFile(f2)
            case 2L => acc(id) = InStm(f2.toInt, f3.toInt)
            case t => throw ParseError(s"PDF: unknown xref entry type $t for object $id")
          }
        }
      }
      if (trailerDict.isEmpty) trailerDict = d
      d.get("Prev") match {
        case Some(PNum(pv)) => pv.toLong
        case _ => -1L
      }
    }

    private val cache = mutable.Map.empty[Int, PObj]
    /** Objects currently being materialized. A well-formed file never
      * re-enters obj() for a number still on the resolution stack; a
      * crafted one can (two ObjStm type-2 xref entries naming each other
      * as containers, or a PRef reference cycle) and without this guard
      * that recursion is unbounded — a StackOverflowError, an Error that
      * would escape the ParseError/NonFatal quarantine contract. */
    private val resolving = mutable.Set.empty[Int]

    // the deferred encryption refusal: objIndex and the resolve caches
    // are all initialized here, so the /Encrypt dictionary (usually an
    // indirect object) can resolve for classification
    encryptObj.foreach(encryptRefusal)

    /** Parses `num gen obj <body> [stream]` directly at a byte offset.
      * Used by object loads AND by xref-stream bootstrap (which runs
      * BEFORE the object index exists — so a stream /Length here must
      * be a direct number; the spec requires that of xref streams). */
    private def parseObjAt(off: Int): (Int, PObj) = {
      val lx = new Lexer(bytes, off)
      val num = lx.next() match {
        case n: PNum => n.toInt
        case o => throw ParseError(s"PDF: expected an object at byte $off, got $o")
      }
      lx.next() match { case PNum(_) => (); case o => throw ParseError(s"PDF: bad gen: $o") }
      lx.expect("obj")
      val body = lx.next()
      lx.skipWs()
      val parsed = body match {
        case d: PDict if lx.matches("stream") =>
          lx.pos += 6
          if (lx.peek == '\r') lx.pos += 1
          if (lx.peek == '\n') lx.pos += 1
          val length = resolveLen(d) match {
            case PNum(v) if v >= 0 && lx.pos + v.toLong <= bytes.length => v.toInt
            case PNum(v) => throw ParseError(
              s"PDF: /Length $v runs past end of file")
            case o => throw ParseError(s"PDF: bad /Length: $o")
          }
          val data = java.util.Arrays.copyOfRange(bytes, lx.pos, lx.pos + length)
          PStream(d, data)
        case other => other
      }
      (num, parsed)
    }

    /** /Length may be an indirect ref in ordinary streams — but the
      * xref-stream bootstrap cannot chase refs yet (objIndex is still
      * being built), and the spec forbids indirect /Length there. */
    private def resolveLen(d: PDict): PObj =
      d.m.getOrElse("Length", throw ParseError("PDF: stream without /Length")) match {
        case r: PRef =>
          if (objIndex == null) throw ParseError(
            "PDF: xref stream /Length must be a direct number (ISO 32000-1 7.5.8.2)")
          resolve(r)
        case direct => direct
      }

    def obj(num: Int): PObj = cache.get(num) match {
      case Some(v) => v
      case None =>
        if (!resolving.add(num)) throw ParseError(
          s"PDF: reference cycle while resolving object $num")
        val v = try objBody(num) finally resolving -= num
        cache(num) = v
        v
    }

    private def objBody(num: Int): PObj =
      objIndex.getOrElse(num, throw ParseError(s"PDF: object $num not in xref")) match {
        case InFile(off) =>
          val (got, body) = parseObjAt(off.toInt)
          if (got != num) throw ParseError(
            s"PDF: expected object $num at byte $off, got object $got")
          body
        case InStm(stmNum, idx) =>
          if (stmNum == num) throw ParseError(
            s"PDF: object $num claims to live inside itself")
          val stm = resolve(obj(stmNum)) match {
            case s: PStream => s
            case o => throw ParseError(s"PDF: object stream $stmNum is not a stream: $o")
          }
          val data = decode(stm.dict, stm.data)
          val n = stm.dict.m.get("N").map(resolve) match {
            case Some(PNum(v)) if v >= 0 => v.toInt
            case o => throw ParseError(s"PDF: object stream missing /N (got $o)")
          }
          val first = stm.dict.m.get("First").map(resolve) match {
            case Some(PNum(v)) if v >= 0 && v <= data.length => v.toInt
            case o => throw ParseError(s"PDF: object stream bad /First (got $o)")
          }
          // header: n (objnum, relative-offset) pairs before /First
          val hx = new Lexer(data, 0)
          val pairs = (0 until n).map { _ =>
            val on = hx.next() match {
              case v: PNum => v.toInt
              case o => throw ParseError(s"PDF: bad ObjStm header entry $o")
            }
            val ro = hx.next() match {
              case v: PNum => v.toInt
              case o => throw ParseError(s"PDF: bad ObjStm header offset $o")
            }
            if (hx.pos > first) throw ParseError(
              "PDF: ObjStm header overruns /First")
            (on, ro)
          }
          // the xref's index is authoritative, but verify it names us —
          // a mismatched container must not silently yield a wrong object
          val (objNum, rel) =
            if (idx >= 0 && idx < pairs.size && pairs(idx)._1 == num) pairs(idx)
            else pairs.find(_._1 == num).getOrElse(throw ParseError(
              s"PDF: object $num not present in object stream $stmNum"))
          if (objNum != num) throw ParseError(
            s"PDF: object stream $stmNum index mismatch for object $num")
          if (first + rel >= data.length) throw ParseError(
            s"PDF: ObjStm offset for object $num runs past the stream")
          new Lexer(data, first + rel).next()
      }

    def resolve(o: PObj): PObj = o match {
      case PRef(n, _) =>
        if (objIndex == null) throw ParseError(
          "PDF: indirect reference inside an xref stream dictionary (7.5.8.2 " +
            "requires direct values there)")
        resolve(obj(n))
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
        case PName("FlateDecode") => unpredict(d, inflate(data))
        case PArr(Vector(PName("FlateDecode"))) => unpredict(d, inflate(data))
        case f => throw ParseError(s"PDF: unsupported stream filter $f " +
          "(only FlateDecode and uncompressed streams are supported)")
      }

    /** Reverses the /DecodeParms predictor xref streams routinely carry
      * (PNG row filters over Columns-wide rows — the layout-compression
      * trick that makes near-identical xref rows deflate well).
      * Predictor 1/absent = identity; >= 10 = PNG (each row prefixed by
      * its filter byte, reversed with the previous ROW as 'up'). */
    private def unpredict(d: PDict, raw: Array[Byte]): Array[Byte] = {
      val parms = resolve(d.m.getOrElse("DecodeParms",
        d.m.getOrElse("DP", PNull))) match {
        case p: PDict => p.m
        case PNull => return raw
        case o => throw ParseError(s"PDF: bad /DecodeParms: $o")
      }
      val pred = parms.get("Predictor").map(resolve) match {
        case Some(PNum(v)) => v.toInt
        case None => 1
        case o => throw ParseError(s"PDF: bad /Predictor: $o")
      }
      if (pred == 1) return raw
      if (pred != 2 && pred < 10) throw ParseError(
        s"PDF: unknown /Predictor $pred (1, 2/TIFF and PNG >= 10 are supported)")
      val cols = parms.get("Columns").map(resolve) match {
        case Some(PNum(v)) if v >= 1 && v <= (1 << 20) => v.toInt
        case None => 1
        case o => throw ParseError(s"PDF: bad /Columns: $o")
      }
      val bpc = parms.get("BitsPerComponent").map(resolve) match {
        case Some(PNum(v)) if Seq(1, 2, 4, 8, 16).contains(v.toInt) => v.toInt
        case None => 8
        case o => throw ParseError(s"PDF: bad /BitsPerComponent: $o")
      }
      val colors = parms.get("Colors").map(resolve) match {
        case Some(PNum(v)) if v >= 1 && v <= 64 => v.toInt
        case None => 1
        case o => throw ParseError(s"PDF: bad /Colors: $o")
      }
      val bpp = math.max(1, colors * bpc / 8)
      // bounded factors (cols <= 2^20, colors <= 64, bpc <= 16) keep
      // this product well inside Int — no truncation surprises
      val rowLen = ((cols.toLong * colors * bpc + 7) / 8).toInt
      if (pred == 2) {
        // TIFF horizontal differencing: no per-row filter byte; each
        // sample is a delta from the previous sample of the SAME
        // component in its row. Sub-byte sample packing would need a
        // bit-level walk no xref stream uses — refuse it by name.
        if (bpc < 8) throw ParseError(
          s"PDF: TIFF predictor with BitsPerComponent $bpc is not supported (8/16 are)")
        if (rowLen <= 0 || raw.length % rowLen != 0)
          throw ParseError(s"PDF: TIFF-predicted data length ${raw.length} is " +
            s"not a multiple of row length $rowLen")
        val out = raw.clone()
        val stride = colors * (bpc / 8)
        var r = 0
        while (r < out.length / rowLen) {
          var i = stride
          if (bpc == 8) {
            while (i < rowLen) {
              out(r * rowLen + i) =
                ((out(r * rowLen + i) + out(r * rowLen + i - stride)) & 0xff).toByte
              i += 1
            }
          } else { // 16-bit samples, big-endian per TIFF
            while (i + 1 < rowLen) {
              val o = r * rowLen + i
              val prev = ((out(o - stride) & 0xff) << 8) | (out(o - stride + 1) & 0xff)
              val cur = ((out(o) & 0xff) << 8) | (out(o + 1) & 0xff)
              val v = (cur + prev) & 0xffff
              out(o) = (v >> 8).toByte
              out(o + 1) = v.toByte
              i += 2
            }
          }
          r += 1
        }
        return out
      }
      if (rowLen <= 0 || (raw.length % (rowLen + 1)) != 0)
        throw ParseError(s"PDF: predicted data length ${raw.length} is not a " +
          s"multiple of row length ${rowLen + 1}")
      val nRows = raw.length / (rowLen + 1)
      val out = new Array[Byte](nRows * rowLen)
      var r = 0
      while (r < nRows) {
        val ft = raw(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var i = 0
        while (i < rowLen) {
          val x = raw(src + i) & 0xff
          val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0 // left
          val b = if (r > 0) out(dst - rowLen + i) & 0xff else 0 // up
          val c = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
          val v = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + ((a + b) >> 1)
            case 4 => // Paeth
              val p = a + b - c
              val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case other => throw ParseError(s"PDF: unknown PNG filter type $other in row $r")
          }
          out(dst + i) = v.toByte
          i += 1
        }
        r += 1
      }
      out
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

  private def deflateBytes(body: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(body); d.finish()
    val out = new java.io.ByteArrayOutputStream(body.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** The PDF 1.5+ twin of [[synthesize]]: the layout modern writers
    * emit — document-structure objects (catalog, page tree, page
    * dicts) packed into ONE Flate-compressed /Type /ObjStm container,
    * content streams as ordinary file objects, and a /Type /XRef
    * cross-reference STREAM (W=[1 4 2] binary rows under the PNG 'up'
    * predictor, the row-delta trick that makes near-identical xref
    * rows deflate well) instead of a classic table. Deterministic; the
    * extract(synthesize15(p)) == extract(synthesize(p)) round-trip is
    * part of the test surface (PdfSpec, ing23). */
  def synthesize15(pages: Seq[String], xrefPredictor: Int = 12): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val n = pages.size
    val pageNum = (i: Int) => 3 + i           // inside the ObjStm
    val contNum = (i: Int) => 3 + n + i       // file objects
    val objStmNum = 3 + 2 * n
    val xrefNum = 4 + 2 * n
    val out = new java.io.ByteArrayOutputStream()
    def write(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    write("%PDF-1.5\n")
    // content streams (FlateDecode, like any modern writer)
    val contOffsets = (0 until n).map { i =>
      val off = out.size().toLong
      val lines = pages(i).split("\n", -1)
      val body = ("BT /F1 12 Tf 72 720 Td " +
        lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET").getBytes("ISO-8859-1")
      val data = deflateBytes(body)
      write(s"${contNum(i)} 0 obj << /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      out.write(data)
      write("\nendstream endobj\n")
      off
    }
    // the object stream: catalog, pages root, page dicts
    val kids = (0 until n).map(i => s"${pageNum(i)} 0 R").mkString(" ")
    val bodies = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
      (0 until n).map(i => s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${contNum(i)} 0 R >>")
    val stmIds = Vector(1, 2) ++ (0 until n).map(pageNum)
    val rel = bodies.scanLeft(0)((acc, b) => acc + b.length + 1)
    val header = stmIds.zip(rel).map { case (id, r) => s"$id $r" }.mkString(" ") + "\n"
    val objStmPlain = (header + bodies.mkString("\n") + "\n").getBytes("ISO-8859-1")
    val objStmData = deflateBytes(objStmPlain)
    val objStmOff = out.size().toLong
    write(s"$objStmNum 0 obj << /Type /ObjStm /N ${stmIds.size} " +
      s"/First ${header.length} /Length ${objStmData.length} /Filter /FlateDecode >>\nstream\n")
    out.write(objStmData)
    write("\nendstream endobj\n")
    // the xref stream: W=[1 4 2] rows for every object 0..xrefNum,
    // PNG 'up' predictor then Flate
    val xrefOff = out.size().toLong
    val size = xrefNum + 1
    def row(tpe: Int, f2: Long, f3: Int): Array[Byte] = Array[Byte](
      tpe.toByte,
      ((f2 >> 24) & 0xff).toByte, ((f2 >> 16) & 0xff).toByte,
      ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
      ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val rows: Vector[Array[Byte]] =
      Vector(row(0, 0L, 65535)) ++                         // 0: free head
      Vector(row(2, objStmNum.toLong, 0),                  // 1: catalog in ObjStm
        row(2, objStmNum.toLong, 1)) ++                    // 2: pages root
      (0 until n).map(i => row(2, objStmNum.toLong, 2 + i)) ++ // page dicts
      (0 until n).map(i => row(1, contOffsets(i), 0)) ++   // content streams
      Vector(row(1, objStmOff, 0), row(1, xrefOff, 0))     // ObjStm, XRef itself
    val rowLen = 7
    val predicted: Array[Byte] =
      if (xrefPredictor == 2) {
        // TIFF horizontal differencing: per-row byte deltas, no filter
        // byte — the other predictor family real writers emit
        val p = new Array[Byte](rows.size * rowLen)
        rows.zipWithIndex.foreach { case (r, i) =>
          var j = 0
          while (j < rowLen) {
            val prev = if (j == 0) 0 else r(j - 1) & 0xff
            p(i * rowLen + j) = (((r(j) & 0xff) - prev) & 0xff).toByte
            j += 1
          }
        }
        p
      } else {
        val p = new Array[Byte](rows.size * (rowLen + 1))
        rows.zipWithIndex.foreach { case (r, i) =>
          p(i * (rowLen + 1)) = 2 // PNG 'up'
          var j = 0
          while (j < rowLen) {
            val prev = if (i == 0) 0 else rows(i - 1)(j) & 0xff
            p(i * (rowLen + 1) + 1 + j) = (((r(j) & 0xff) - prev) & 0xff).toByte
            j += 1
          }
        }
        p
      }
    val xrefData = deflateBytes(predicted)
    write(s"$xrefNum 0 obj << /Type /XRef /Size $size /W [1 4 2] /Root 1 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor $xrefPredictor /Columns 7 >> " +
      s"/Length ${xrefData.length} >>\nstream\n")
    out.write(xrefData)
    write("\nendstream endobj\n")
    write(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}
