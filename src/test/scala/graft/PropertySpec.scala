package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.domain.IngestionConfigRule
import graft.rules.RuleMatcher
import graft.parsers.{ExcelParser, ParserDispatch}

/** Property-based invariants for the pure control-plane logic. ScalaCheck
  * generators with deterministic seeded sampling (the scalatest bridge
  * artifact isn't in the offline cache, so sampling is driven manually). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyGen: Gen[String] = for {
    dir <- Gen.oneOf("data", "logs", "reports", "archive")
    name <- Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(12))
    ext <- Gen.oneOf("csv", "json", "txt", "xml", "xlsx", "pdf", "bin")
  } yield s"$dir/$name.$ext"

  test("rule matching: best match is always a matching rule of maximal pattern length") {
    val matcher = new RuleMatcher(RuleMatcher.seedRules)
    samples(keyGen).foreach { key =>
      val all = matcher.matching(key)
      matcher.findBestMatch(key) match {
        case Some(best) =>
          assert(all.contains(best), key)
          assert(all.forall(_.pattern.length <= best.pattern.length), key)
        case None => assert(all.isEmpty, key)
      }
    }
  }

  test("rule matching: adding a never-matching rule changes nothing") {
    val base = new RuleMatcher(RuleMatcher.seedRules)
    val extended = new RuleMatcher(
      RuleMatcher.seedRules :+ IngestionConfigRule("^\\$never-matches\\$$", "nowhere"))
    samples(keyGen).foreach { key =>
      assert(base.findBestMatch(key) == extended.findBestMatch(key), key)
    }
  }

  test("extension extraction: lowercased, last dot, stable under path prefixes") {
    samples(Gen.zip(keyGen, Gen.oneOf("", "a/", "b/c/"))).foreach { case (key, prefix) =>
      val ext = ParserDispatch.extractFileType(key)
      assert(ext == ext.toLowerCase, key)
      assert(ParserDispatch.extractFileType(prefix + key) == ext, key)
      assert(ParserDispatch.extractFileType(key.toUpperCase) == ext, key)
    }
  }

  test("bson codec: arbitrary nested documents round-trip exactly") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
    import graft.sinks.Bson
    val nodes = JsonNodeFactory.instance

    // generators mirror what the sink actually emits: Jackson trees of
    // strings (incl. multi-byte UTF-8), int32/int64 (class chosen by range,
    // matching the codec's smallest-type rule), finite doubles, booleans,
    // nulls, and nesting. Keys are NUL-free non-empty strings.
    val keyG: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(10)),
      Gen.const("champ_é中"), Gen.const("a.b$c"), Gen.const(" "))
    val intG: Gen[JsonNode] = Gen.choose(Int.MinValue, Int.MaxValue).map(nodes.numberNode)
    val longG: Gen[JsonNode] = Gen.oneOf(
      Gen.choose(Int.MaxValue.toLong + 1, Long.MaxValue),
      Gen.choose(Long.MinValue, Int.MinValue.toLong - 1)).map(nodes.numberNode)
    val dblG: Gen[JsonNode] = Gen.choose(-1e12, 1e12).map(nodes.numberNode)
    val strG: Gen[JsonNode] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(30)), Gen.const("café 中文 😀"),
      Gen.const("")).map(nodes.textNode)
    val scalarG: Gen[JsonNode] = Gen.oneOf(intG, longG, dblG, strG,
      Gen.oneOf(true, false).map(nodes.booleanNode),
      Gen.const(nodes.nullNode(): JsonNode))
    def valueG(depth: Int): Gen[JsonNode] =
      if (depth == 0) scalarG
      else Gen.frequency(6 -> scalarG, 2 -> docG(depth - 1),
        2 -> Gen.listOfN(3, valueG(depth - 1)).map { vs =>
          val a = nodes.arrayNode(); vs.foreach(a.add); (a: JsonNode)
        })
    def docG(depth: Int): Gen[JsonNode] = for {
      n <- Gen.choose(0, 5)
      ks <- Gen.listOfN(n, keyG)
      vs <- Gen.listOfN(n, valueG(depth))
    } yield {
      val o = nodes.objectNode()
      ks.zip(vs).foreach { case (k, v) => o.set[JsonNode](k, v) }
      o
    }

    samples(docG(3), 300).foreach { doc =>
      val bytes = Bson.encodeDocument(doc)
      // framing: declared length is the whole byte string, NUL-terminated
      val declared = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
      assert(declared == bytes.length && bytes.last == 0, doc.toString)
      val back: ObjectNode = Bson.decodeDocument(
        java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN))
      assert(back == doc, s"round-trip mismatch:\n  in:  $doc\n  out: $back")
    }
  }

  test("bson codec: int64 overflow and NUL-bearing keys are refused, not corrupted") {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.JsonNodeFactory
    import graft.sinks.Bson
    val nodes = JsonNodeFactory.instance
    val big = nodes.objectNode()
    big.set[JsonNode]("v", nodes.numberNode(new java.math.BigInteger("9223372036854775808")))
    intercept[IllegalArgumentException](Bson.encodeDocument(big))
    val nul = nodes.objectNode()
    nul.set[JsonNode]("a\u0000b", nodes.textNode("x"))
    intercept[IllegalArgumentException](Bson.encodeDocument(nul))
  }

  test("pdf extractor: random truncations and byte mutations never " +
      "escape the ParseError contract") {
    import graft.domain.IngestionError.ParseError
    import graft.ops.Pdf
    // both container generations: classic table AND 1.5 xref/object
    // streams (binary rows + predictor + ObjStm header arithmetic are
    // fresh bounds-error surface)
    val bases = Seq(
      Pdf.synthesize(Seq("fuzz target body", "second (page)")),
      Pdf.synthesize15(Seq("fuzz target body", "second (page)")))
    def mutOf(base: Array[Byte]): Gen[Array[Byte]] = Gen.oneOf(
      // truncation at any point
      Gen.choose(0, base.length - 1).map(base.take),
      // single-byte corruption anywhere
      for { i <- Gen.choose(0, base.length - 1); b <- Gen.choose(0, 255) }
        yield { val c = base.clone(); c(i) = b.toByte; c },
      // splice garbage into the middle
      for { i <- Gen.choose(0, base.length - 1); s <- Gen.alphaStr }
        yield base.take(i) ++ s.getBytes("ISO-8859-1") ++ base.drop(i))
    val mutGen: Gen[Array[Byte]] =
      Gen.oneOf(bases.map(mutOf)).flatMap(identity)
    samples(mutGen, n = 400).foreach { bytes =>
      // either parses (mutation hit slack space) or refuses instructively;
      // any OTHER throwable (bounds, number-format, negative-size) is the
      // escape class the round-10 advisory flagged
      try { Pdf.extract(bytes): Unit }
      catch {
        case _: ParseError => ()
        case e: Throwable =>
          fail(s"non-ParseError ${e.getClass.getName}: ${e.getMessage} " +
            s"(len=${bytes.length})")
      }
    }
  }

  test("xlsx reader: random truncations and byte mutations never " +
      "escape the ParseError contract") {
    import graft.domain.IngestionError.ParseError
    val baos = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(baos)
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      "<sst><si><t>alpha</t></si><si><t>beta</t></si></sst>")
    entry("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1"><v>30.0</v></c></row><row r="2"><c t="s"><v>1</v></c>""" +
      """</row></sheetData></worksheet>""")
    zout.close()
    val base = baos.toByteArray
    val dir = java.nio.file.Files.createTempDirectory("xlsx_fuzz")
    val mutGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.choose(0, base.length - 1).map(base.take),
      for { i <- Gen.choose(0, base.length - 1); b <- Gen.choose(0, 255) }
        yield { val c = base.clone(); c(i) = b.toByte; c },
      for { i <- Gen.choose(0, base.length - 1); s <- Gen.alphaStr }
        yield base.take(i) ++ s.getBytes("UTF-8") ++ base.drop(i))
    samples(mutGen, n = 300).zipWithIndex.foreach { case (bytes, i) =>
      val p = dir.resolve(s"f$i.xlsx")
      java.nio.file.Files.write(p, bytes)
      try { ExcelParser.readSheet(p.toString, 0): Unit }
      catch {
        case _: ParseError => ()
        case e: Throwable =>
          fail(s"non-ParseError ${e.getClass.getName}: ${e.getMessage} " +
            s"(mutation $i, len=${bytes.length})")
      }
    }
  }

  test("audio/container metadata parsers: mutations never escape the " +
      "refusal contract (require -> IllegalArgumentException)") {
    import graft.ops.{Flac, Mp3, Mp4}
    import graft.ops.Multimodal.MediaItem
    val targets: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("mp4", Mp4.Mp4Encoder.minimal(1000L, 7500L, 320, 240,
        videoSamples = 90L, audioSamples = 300L),
        b => Mp4.parse(MediaItem(1L, b))),
      ("mp3", Mp3.Mp3Encoder.encode("fuzz title", "fuzz artist", nFrames = 4),
        b => Mp3.parse(MediaItem(1L, b))),
      ("flac", Flac.FlacEncoder.encode(44100, 2, 16, 44100L, "t", "a"),
        b => Flac.parse(MediaItem(1L, b))))
    targets.foreach { case (name, base, parse) =>
      val mutGen: Gen[Array[Byte]] = Gen.oneOf(
        Gen.choose(0, base.length - 1).map(base.take),
        for { i <- Gen.choose(0, base.length - 1); b <- Gen.choose(0, 255) }
          yield { val c = base.clone(); c(i) = b.toByte; c },
        for { i <- Gen.choose(0, base.length - 1); s <- Gen.alphaStr }
          yield base.take(i) ++ s.getBytes("ISO-8859-1") ++ base.drop(i))
      samples(mutGen, n = 250).foreach { bytes =>
        try { parse(bytes): Unit }
        catch {
          case _: IllegalArgumentException => () // the require contract
          case e: Throwable =>
            fail(s"$name: non-refusal ${e.getClass.getName}: ${e.getMessage} " +
              s"(len=${bytes.length})")
        }
      }
    }
  }

  test("pixel decoders (PNG/BMP/GIF/TIFF): mutations never escape the " +
      "refusal contract") {
    import graft.ops.Multimodal._
    import graft.ops.{Gif, Tiff}
    val img = PixelImage(5, 4, Array.tabulate(60)(i => (i * 7).toByte))
    val gifIdx = Array.tabulate(20)(i => (i % 16).toByte)
    val targets: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("png", PngEncoder.encode(img),
        b => PngDecoder.decodePixels(MediaItem(1L, b))),
      ("bmp", BmpEncoder.encode(img),
        b => BmpDecoder.decodePixels(MediaItem(1L, b))),
      ("gif", Gif.GifEncoder.encode(5, 4, gifIdx),
        b => Gif.GifDecoder.decodePixels(MediaItem(1L, b))),
      ("tiff", Tiff.TiffEncoder.encode(img),
        b => Tiff.TiffDecoder.decodePixels(MediaItem(1L, b))),
      ("avi", graft.ops.Avi.AviMjpegEncoder.encode(
          Seq(graft.ops.Jpeg.JpegEncoder.solidGray(16, 16, 100)), 16, 16, 40000),
        b => { val it = MediaItem(1L, b)
          graft.ops.Avi.decodeMeta(it): Unit
          graft.ops.Avi.decodeFrame(it, 0) }),
      ("flac-pcm", graft.ops.FlacPcm.FlacPcmEncoder.encode(
          Array.tabulate(128)(i => ((i * 37) % 4000) - 2000), 8000,
          blockSize = 64, orderFor = _ => 2, partitionOrder = 1),
        b => graft.ops.FlacPcm.decode(MediaItem(1L, b))),
      ("flac-pcm-stereo", graft.ops.FlacPcm.FlacPcmEncoder.encodeStereo(
          Array.tabulate(128)(i => ((i * 37) % 4000) - 2000),
          Array.tabulate(128)(i => ((i * 53) % 4000) - 2000), 8000,
          blockSize = 64, modeFor = f => Seq(1, 8, 9, 10)(f % 4),
          orderFor = _ => 2, partitionOrder = 1),
        b => graft.ops.FlacPcm.decode(MediaItem(1L, b))),
      ("adpcm", graft.ops.Adpcm.encodeWav(
          Array.tabulate(381)(i => ((i * 40) % 4000 - 2000).toShort), 8000,
          blockSamples = 127),
        b => graft.ops.Adpcm.decode(MediaItem(1L, b))),
      ("adpcm-stereo", graft.ops.Adpcm.encodeWavStereo(
          Array.tabulate(385)(i => ((i * 40) % 4000 - 2000).toShort),
          Array.tabulate(385)(i => ((i * 72) % 4000 - 2000).toShort), 8000,
          blockSamples = 129),
        b => graft.ops.Adpcm.decode(MediaItem(1L, b))))
    targets.foreach { case (name, base, decode) =>
      val mutGen: Gen[Array[Byte]] = Gen.oneOf(
        Gen.choose(0, base.length - 1).map(base.take),
        for { i <- Gen.choose(0, base.length - 1); b <- Gen.choose(0, 255) }
          yield { val c = base.clone(); c(i) = b.toByte; c },
        for { i <- Gen.choose(0, base.length - 1); s <- Gen.alphaStr }
          yield base.take(i) ++ s.getBytes("ISO-8859-1") ++ base.drop(i))
      samples(mutGen, n = 250).foreach { bytes =>
        try { decode(bytes): Unit }
        catch {
          case _: IllegalArgumentException => () // the require contract
          case e: Throwable =>
            fail(s"$name: non-refusal ${e.getClass.getName}: ${e.getMessage} " +
              s"(len=${bytes.length})")
        }
      }
    }
  }

  test("excel column refs: index is monotone in column letters") {
    val refGen = for {
      n <- Gen.choose(1, 3)
      letters <- Gen.listOfN(n, Gen.choose('A', 'Z')).map(_.mkString)
      row <- Gen.choose(1, 999)
    } yield (letters, row)
    samples(refGen).foreach { case (letters, row) =>
      val idx = ExcelParser.columnIndex(s"$letters$row")
      assert(idx >= 0, letters)
      // appending a letter always yields a larger index (base-26 positional)
      assert(ExcelParser.columnIndex(s"${letters}A$row") > idx, letters)
    }
  }

  test("quarantine dispatch: mutations of EVERY sniffed format classify " +
      "as decoded-or-refused — no Error ever escapes the NonFatal net") {
    // mm24/mm25's contract at the property level: whatever bytes arrive
    // in the mixed column, the quarantine's try/NonFatal either serves a
    // row or lands ok=false — a StackOverflowError or OutOfMemoryError
    // from any routed decoder would instead kill the Spark task.
    import graft.ops.Multimodal._
    import graft.ops.{Gif, Tiff, Mp3, Mp4, Flac}
    val img = PixelImage(5, 4, Array.tabulate(60)(i => (i * 7).toByte))
    val bases: Seq[(String, Array[Byte])] = Seq(
      ("ppm", "P6\n5 4\n255\n".getBytes("US-ASCII") ++ img.rgb),
      ("bmp", BmpEncoder.encode(img)),
      ("png", PngEncoder.encode(img)),
      ("jpeg", graft.ops.Jpeg.JpegEncoder.solidGray(16, 16, 100)),
      ("gif", Gif.GifEncoder.encode(5, 4, Array.tabulate(20)(i => (i % 16).toByte))),
      ("tiff", Tiff.TiffEncoder.encode(img)),
      ("mp4", Mp4.Mp4Encoder.minimal(1000L, 7500L, 320, 240,
        videoSamples = 90L, audioSamples = 300L)),
      ("mp3", Mp3.Mp3Encoder.encode("fuzz title", "fuzz artist", nFrames = 4)),
      ("flac", Flac.FlacEncoder.encode(44100, 2, 16, 44100L, "t", "a")),
      ("avi", graft.ops.Avi.AviMjpegEncoder.encode(
        Seq(graft.ops.Jpeg.JpegEncoder.solidGray(16, 16, 100)), 16, 16, 40000)),
      ("webp", graft.ops.Webp.Vp8lEncoder.encode(6, 5,
        (0 until 30).map(i => graft.ops.Webp.Vp8lEncoder.Lit(
          0xFF000000 | ((i * 37 % 256) << 16) | ((i * 11 % 256) << 8) | (i * 5 % 256))),
        cacheBits = 3)))
    bases.foreach { case (name, base) =>
      val mutGen: Gen[Array[Byte]] = Gen.oneOf(
        Gen.choose(0, base.length - 1).map(base.take),
        for { i <- Gen.choose(0, base.length - 1); b <- Gen.choose(0, 255) }
          yield { val c = base.clone(); c(i) = b.toByte; c },
        for { i <- Gen.choose(0, base.length - 1); s <- Gen.alphaStr }
          yield base.take(i) ++ s.getBytes("ISO-8859-1") ++ base.drop(i))
      samples(mutGen, n = 150).foreach { bytes =>
        try { SniffMetaDecoder.decode(MediaItem(1L, bytes)): Unit }
        catch {
          case e if scala.util.control.NonFatal(e) => () // quarantined
          case e: Throwable =>
            fail(s"$name meta: ${e.getClass.getName} escapes the quarantine " +
              s"(len=${bytes.length})")
        }
        try { SniffPixelDecoder.decodePixels(MediaItem(1L, bytes)): Unit }
        catch {
          case e if scala.util.control.NonFatal(e) => () // quarantined
          case e: Throwable =>
            fail(s"$name pixel: ${e.getClass.getName} escapes the quarantine " +
              s"(len=${bytes.length})")
        }
      }
      // the pristine fixture must classify as DECODED through the meta
      // dispatch (no format regresses into its own quarantine)
      assert(SniffMetaDecoder.decode(MediaItem(1L, base)).byteLen == base.length)
    }
  }
}
