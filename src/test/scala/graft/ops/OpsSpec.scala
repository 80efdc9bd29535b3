package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.{DedupQueries, ExtendedQueries, MultimodalQueries, RelationalQueries, SimilarityQueries}

/** Semantics checks for the beyond-reference operators: the mapPartitions
  * decoder path must agree with the column-expression query path; LSH
  * candidates must contain every truly-similar pair (recall vs the exact
  * quadratic check); IVF ANN must achieve high recall vs brute force. */
class OpsSpec extends SparkSpec {

  test("multimodal: mapPartitions decoder path == column-expression path (mm01)") {
    val viaQuery = MultimodalQueries.defs("mm01_media_metadata")(spark, sf0001)
      .select(col("media_id"), col("byte_len"), col("content_hash"), col("width"),
        col("height"), col("frame_count"))
      .collect().map(_.toSeq).toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val viaDecoder = Multimodal.decodeMeta(docs, "doc_id", "payload")
      .toDF().select(col("mediaId"), col("byteLen"), col("contentHash"), col("width"),
        col("height"), col("frameCount"))
      .collect().map(_.toSeq).toSet
    assert(viaDecoder == viaQuery)
  }

  test("multimodal: PPM decoder recovers a fixture image byte-exactly") {
    // 2x2 P6 with a header comment: red, green / blue, white.
    val pixels = Array[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,
      0, 0, 255.toByte,  255.toByte, 255.toByte, 255.toByte)
    val ppm = "P6\n# fixture\n2 2\n255\n".getBytes("US-ASCII") ++ pixels
    val img = Multimodal.PpmDecoder.decodePixels(Multimodal.MediaItem(1L, ppm))
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == pixels.toSeq)
    val meta = Multimodal.PpmDecoder.decode(Multimodal.MediaItem(1L, ppm))
    assert(meta.width == 2 && meta.height == 2 && meta.frameCount == 1)
  }

  test("multimodal: WAV decoder walks RIFF chunks and recovers LE int16 samples") {
    // Mono 16-bit PCM at 8 kHz with a junk LIST chunk BEFORE data (the
    // chunk walk must skip it, not assume the canonical 44-byte layout)
    // and an odd-sized chunk (word alignment pads one byte).
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 7)
    val junk = Array[Byte](1, 2, 3) // odd size -> 1 alignment pad byte
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + 4 + 8 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(bb.capacity - 8)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk).put(0.toByte)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val a = Multimodal.WavDecoder.decodeAudio(Multimodal.MediaItem(3L, bb.array()))
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq) // incl. full-scale negatives
    // malformed inputs error, not garbage: wrong magic / no data chunk
    intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decodeAudio(
        Multimodal.MediaItem(4L, "RIFFxxxxAIFF".getBytes("US-ASCII")))
    }
    intercept[IllegalArgumentException] {
      val noData = java.util.Arrays.copyOfRange(bb.array(), 0, 12 + 8 + 16)
      Multimodal.WavDecoder.decodeAudio(Multimodal.MediaItem(5L, noData))
    }
  }

  test("multimodal: audioStats clip/peak/mean-square over a known clip") {
    import spark.implicits._
    // One clip: samples 0, 2000, -2048, 100 -> peak 2048, nClip 2
    // (|s| >= 2000), meanSquare = (0 + 4e6 + 2048^2 + 1e4)/4.
    val samples = Array[Short](0, 2000, -2048, 100)
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val df = Seq((9L, bb.array())).toDF("media_id", "payload")
    val st = Multimodal.audioStats(df, "media_id", "payload").collect().head
    assert(st.sampleRate == 8000 && st.nFrames == 4L && st.durationMs == 0L)
    assert(st.peak == 2048 && st.nClip == 2L)
    assert(st.meanSquare == (0L + 2000L * 2000 + 2048L * 2048 + 100L * 100).toDouble / 4)
  }

  test("multimodal: BMP decoder flips bottom-up BGR rows and strips padding") {
    // 3x2 24-bit BMP: rows pad 9 -> 12 bytes; storage is bottom-up BGR.
    // Logical top row: red green blue; bottom row: white black gray.
    def bgrRow(px: Seq[(Int, Int, Int)]): Array[Byte] =
      (px.flatMap { case (r, g, b) => Seq(b.toByte, g.toByte, r.toByte) } ++
        Seq.fill(3)(0.toByte)).toArray // 3 pad bytes
    val storedBottomFirst =
      bgrRow(Seq((255, 255, 255), (0, 0, 0), (128, 128, 128))) ++
      bgrRow(Seq((255, 0, 0), (0, 255, 0), (0, 0, 255)))
    val header = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    header.put('B'.toByte).put('M'.toByte).putInt(54 + 24).putInt(0).putInt(54)
    header.putInt(40).putInt(3).putInt(2) // info size, width, height (bottom-up)
      .putShort(1).putShort(24).putInt(0).putInt(24)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    val bmp = header.array() ++ storedBottomFirst
    val img = Multimodal.BmpDecoder.decodePixels(Multimodal.MediaItem(2L, bmp))
    assert(img.width == 3 && img.height == 2)
    assert(img.rgb.toSeq == Seq[Byte](
      255.toByte, 0, 0,  0, 255.toByte, 0,  0, 0, 255.toByte,
      255.toByte, 255.toByte, 255.toByte,  0, 0, 0,
      128.toByte, 128.toByte, 128.toByte))
  }

  test("multimodal: sniffing dispatch routes real formats to real decoders") {
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30)
    val real = Multimodal.SniffDecoder.decode(Multimodal.MediaItem(1L, ppm))
    assert(real.width == 1 && real.height == 1 && real.frameCount == 1)
    val png = Multimodal.PngEncoder.encode(
      Multimodal.PixelImage(2, 1, Array[Byte](1, 2, 3, 4, 5, 6)))
    val viaPng = Multimodal.SniffDecoder.decode(Multimodal.MediaItem(3L, png))
    assert(viaPng.width == 2 && viaPng.height == 1, "PNG signature routes to PngDecoder")
    val opaque = "not an image".getBytes("US-ASCII")
    val stub = Multimodal.SniffDecoder.decode(Multimodal.MediaItem(2L, opaque))
    assert(stub.width == opaque.length % 640, "codec-less payloads keep stub semantics")
  }

  test("multimodal: PNG round-trips byte-exactly under every filter type") {
    // A 5x7 RGB image with full byte-range content (ramps + step edges
    // that make Sub/Up/Average/Paeth produce distinct filtered bytes).
    val w = 5; val h = 7
    val rgb = Array.tabulate(w * h * 3) { i =>
      ((i * 37 + (i / 3) * 11 + (i / 15) * 101) % 256).toByte
    }
    val img = Multimodal.PixelImage(w, h, rgb)
    // Each fixed filter type, plus the per-row mix the gated query uses.
    (0 to 4).foreach { f =>
      val bytes = Multimodal.PngEncoder.encode(img, _ => f)
      val out = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(f.toLong, bytes))
      assert(out.width == w && out.height == h)
      assert(out.rgb.toSeq == rgb.toSeq, s"filter $f round-trip differs")
    }
    val mixed = Multimodal.PngEncoder.encode(img, y => y % 5)
    val out = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(9L, mixed))
    assert(out.rgb.toSeq == rgb.toSeq, "mixed-filter round-trip differs")
  }

  test("multimodal: PNG decoder normalizes gray/palette/alpha color types to RGB") {
    // Hand-build minimal PNGs for color types 0/3/4/6 (the encoder only
    // writes type 2) — deflate the raw scanlines directly.
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(body)
      java.nio.ByteBuffer.allocate(body.length + 8)
        .putInt(data.length).put(body).putInt(crc.getValue.toInt).array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream(); val tmp = new Array[Byte](512)
      while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
      d.end(); buf.toByteArray
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def png(colorType: Int, scanlines: Array[Byte], plte: Option[Array[Byte]] = None): Array[Byte] = {
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(2).putInt(1)
        .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      sig ++ chunk("IHDR", ihdr.array()) ++
        plte.map(chunk("PLTE", _)).getOrElse(Array.emptyByteArray) ++
        chunk("IDAT", deflate(scanlines)) ++ chunk("IEND", Array.emptyByteArray)
    }
    // 2x1 grayscale (type 0): values 7, 200 -> replicated to RGB.
    val gray = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(1L,
      png(0, Array[Byte](0, 7, 200.toByte))))
    assert(gray.rgb.toSeq == Seq[Byte](7, 7, 7, 200.toByte, 200.toByte, 200.toByte))
    // 2x1 palette (type 3): indices 1, 0 against a 2-entry PLTE.
    val pal = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(2L,
      png(3, Array[Byte](0, 1, 0),
        plte = Some(Array[Byte](10, 20, 30, 40, 50, 60)))))
    assert(pal.rgb.toSeq == Seq[Byte](40, 50, 60, 10, 20, 30))
    // 2x1 gray+alpha (type 4): alpha dropped, gray replicated.
    val ga = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(3L,
      png(4, Array[Byte](0, 9, 128.toByte, 250.toByte, 0))))
    assert(ga.rgb.toSeq == Seq[Byte](9, 9, 9, 250.toByte, 250.toByte, 250.toByte))
    // 2x1 RGBA (type 6): alpha dropped.
    val rgba = Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(4L,
      png(6, Array[Byte](0, 1, 2, 3, 99.toByte, 4, 5, 6, 7))))
    assert(rgba.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
    // Malformed inputs error, not garbage: bad signature, truncated
    // IDAT, palette image without PLTE.
    intercept[IllegalArgumentException] {
      Multimodal.PngDecoder.decodePixels(
        Multimodal.MediaItem(5L, "how about no".getBytes("US-ASCII")))
    }
    intercept[IllegalArgumentException] {
      val full = png(0, Array[Byte](0, 7, 200.toByte))
      Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(6L,
        java.util.Arrays.copyOfRange(full, 0, full.length - 20)))
    }
    intercept[IllegalArgumentException] {
      Multimodal.PngDecoder.decodePixels(Multimodal.MediaItem(7L,
        png(3, Array[Byte](0, 1, 0)))) // type 3, no PLTE
    }
  }

  test("multimodal: PNG and PPM encodings of one image produce the same dHash") {
    import spark.implicits._
    // The perceptual fingerprint must be format-independent: the same
    // raster through either real decoder yields identical bits — the
    // property that makes dHash dedup catch re-encoded copies.
    val rgb = Array.tabulate(9 * 8 * 3)(i => ((i / 3 * 13 + 5) % 256).toByte)
    val ppm = "P6\n9 8\n255\n".getBytes("US-ASCII") ++ rgb
    val pngB = Multimodal.PngEncoder.encode(Multimodal.PixelImage(9, 8, rgb), y => y % 5)
    val viaPpm = Multimodal.dhash64(
      Seq((1L, ppm)).toDF("media_id", "payload"), "media_id", "payload",
      Multimodal.PpmDecoder).collect().head
    val viaPng = Multimodal.dhash64(
      Seq((1L, pngB)).toDF("media_id", "payload"), "media_id", "payload",
      Multimodal.PngDecoder).collect().head
    assert((viaPpm.dhashHi, viaPpm.dhashLo) == ((viaPng.dhashHi, viaPng.dhashLo)))
  }

  test("multimodal: pixelStats computes real luma stats, partition-invariant") {
    import spark.implicits._
    def gray(v: Int) = // 2x1 uniform gray PPM -> luma == v exactly
      "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array.fill(6)(v.toByte)
    val docs = Seq((1L, gray(0)), (2L, gray(100)), (3L, gray(255)))
      .toDF("media_id", "payload")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.pixelStats(df, "media_id", "payload", Multimodal.PpmDecoder)
        .collect().map(s => s.mediaId -> ((s.meanLuma, s.minLuma, s.maxLuma))).toMap
    val stats = run(docs)
    assert(stats(1L) == ((0.0, 0, 0)))
    assert(stats(2L) == ((100.0, 100, 100)))
    assert(stats(3L) == ((255.0, 255, 255)))
    assert(run(docs.repartition(7)) == stats)
  }

  test("multimodal: nearest-neighbor resize is byte-exact down and up") {
    // 4x2 source; pixel j (row-major) is the uniform value 10*j.
    val src = Multimodal.PixelImage(4, 2,
      Array.tabulate(24)(i => (10 * (i / 3)).toByte))
    // Downscale to 2x1: floor mapping samples (0,0) and (2,0) -> j=0, j=2.
    val down = Multimodal.resize(src, 2, 1)
    assert(down.width == 2 && down.height == 1)
    assert(down.rgb.toSeq == Seq[Byte](0, 0, 0, 20, 20, 20))
    // Upscale 2x1 -> 4x2 replicates: sx = x*2/4 = x/2, sy = 0.
    val up = Multimodal.resize(down, 4, 2)
    assert(up.rgb.toSeq ==
      Seq[Byte](0, 0, 0, 0, 0, 0, 20, 20, 20, 20, 20, 20,
        0, 0, 0, 0, 0, 0, 20, 20, 20, 20, 20, 20))
  }

  test("multimodal: thumbnailStats = decode+resize+luma, partition-invariant") {
    import spark.implicits._
    // 4x2 gray ramp PPM: pixel j has value 10*j; 2x1 thumb samples j=0, j=2.
    val px = Array.tabulate(24)(i => (10 * (i / 3)).toByte)
    val ppm = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ px
    val docs = Seq((1L, ppm)).toDF("media_id", "payload")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.thumbnailStats(df, "media_id", "payload",
          Multimodal.PpmDecoder, outW = 2, outH = 1)
        .collect().map(s => (s.mediaId, s.srcWidth, s.srcHeight,
          s.outWidth, s.outHeight, s.meanLuma, s.minLuma, s.maxLuma)).toSet
    val stats = run(docs)
    assert(stats == Set((1L, 4, 2, 2, 1, 10.0, 0, 20)))
    assert(run(docs.repartition(5)) == stats)
  }

  test("multimodal: frame sampling emits every step-th frame") {
    import spark.implicits._
    val meta = Seq((1L, "h1", 7), (2L, "h2", 12)).toDF("mediaId", "contentHash", "frameCount")
    val frames = Multimodal.sampleFrames(meta, step = 5).collect()
    val byId = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(3)).sorted.toSeq).toMap
    assert(byId(1L) == Seq(0, 5))
    assert(byId(2L) == Seq(0, 5, 10))
  }

  test("pq: ADC shortlist + exact rerank achieves >= 0.8 recall@10") {
    import org.apache.spark.sql.functions.{broadcast, expr}
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (codes, codebook) = Pq.model(emb, "vec_id", "embedding",
      dims = 64, m = 8, k = 16, iters = 2)
    val pq = Pq.adcRerankTopK(emb, codes, codebook,
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        dims = 64, m = 8, shortlistK = 100, topK = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val q = Clustering.quantize(emb.filter(col("vec_id") === 0), "vec_id", "embedding")
      .select(expr("transform(q, x -> cast(x as double))").as("qm"))
    val exact = Clustering.quantize(emb.filter(col("vec_id") =!= 0), "vec_id", "embedding")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), expr(
        """aggregate(zip_with(q, qm, (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
          |          0D, (acc, x) -> acc + x)""".stripMargin).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (pq & exact).size / 10.0
    assert(recall >= 0.8, s"PQ recall@10 = $recall (pq=$pq exact=$exact)")
  }

  test("pq: encode against the trained codebook reproduces model's own " +
      "codes — the persisted-index incremental path cannot drift") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (codes, codebook) = Pq.model(emb, "vec_id", "embedding",
      dims = 64, m = 8, k = 16, iters = 2)
    // round-trip the codebook through parquet, as a lake table would
    val dir = java.nio.file.Files.createTempDirectory("graft_pqenc")
    codebook.write.parquet(dir.resolve("cb").toString)
    val cbBack = spark.read.parquet(dir.resolve("cb").toString)
    val re = Pq.encode(emb, cbBack, "vec_id", "embedding", dims = 64, m = 8)
    val mismatch = codes.withColumnRenamed("code", "c1")
      .join(re.withColumnRenamed("code", "c2"), Seq("vec_id", "sub"))
      .filter(col("c1") =!= col("c2")).count()
    assert(mismatch == 0L, s"$mismatch (vec, sub) codes drifted")
    assert(re.count() == codes.count())
  }

  test("dedup: LSH candidates achieve full recall over high-Jaccard pairs") {
    // Exact 8-gram Jaccard on all pairs of a small doc set vs the banded
    // MinHash candidates: every pair with J >= 0.5 must be a candidate
    // (4 bands x 4 rows: P(candidate) = 1-(1-J^4)^4 = 0.95 at J=0.8,
    // 0.24 at J=0.5 per band family — on synthetic near-dups J is ~1.0).
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(40)
      .select(col("doc_id"), col("text"))
    // plant exact + near duplicates
    val dups = docs.filter(col("doc_id") < 3)
      .select(col("doc_id") + 10000, concat(col("text"), lit(" tail")).as("text"))
      .union(docs.filter(col("doc_id") < 2).select(col("doc_id") + 20000, col("text")))
    val corpus = docs.union(dups)
    corpus.createOrReplaceTempView("spec_corpus")

    val shingles = "array_distinct(transform(sequence(1, greatest(length(text) - 7, 1)), i -> substr(text, i, 8)))"
    val exact = spark.sql(
      s"""WITH d AS (SELECT doc_id, $shingles AS sh FROM spec_corpus)
         |SELECT a.doc_id AS da, b.doc_id AS db,
         |  size(array_intersect(a.sh, b.sh)) / CAST(size(array_union(a.sh, b.sh)) AS DOUBLE) AS j
         |FROM d a JOIN d b ON a.doc_id < b.doc_id""".stripMargin)
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")

    val tmp = java.nio.file.Files.createTempDirectory("lsh_spec")
    corpus.write.parquet(tmp.resolve("documents.parquet").toString)
    Seq.empty[Long].toDF("x") // keep implicits used
    val candidates = DedupQueries.defs("dd04_lsh_candidates")(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(candidates),
      s"missed pairs: ${exact -- candidates}")
  }

  test("multimodal: feature-extraction stub feeds the ANN path end-to-end") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .limit(100)
    val emb = Multimodal.extractFeatures(docs, "doc_id", "payload", dim = 32)
    assert(emb.schema("embedding").dataType.simpleString == "array<float>")
    val first = emb.orderBy("doc_id").head()
    assert(first.getSeq[Float](1).length == 32)
    // deterministic across runs/partitionings
    val again = Multimodal.extractFeatures(docs.repartition(7), "doc_id", "payload", dim = 32)
      .orderBy("doc_id").head()
    assert(first.getSeq[Float](1) == again.getSeq[Float](1))
    // pseudo-embeddings flow into the cosine kernel
    graft.functions.VectorFunctions.registerAll(spark)
    val selfSim = emb.select(expr("round(vector_cosine(embedding, embedding), 6)").as("c"))
      .filter(col("c") =!= 1.0).count()
    assert(selfSim == 0)
  }

  test("similarity: IVF ANN recall@10 >= 0.7 vs brute force") {
    val brute = SimilarityQueries.defs("sim01_cosine_topk")(spark, sf0001)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityQueries.defs("sim02_ivf_ann")(spark, sf0001)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.7, s"recall@10 = $recall")
  }

  test("dedup: library pipeline — exact drop + LSH near-dup pairs") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
    val withDups = docs
      .union(docs.filter(col("doc_id") < 4).select(col("doc_id") + 5000, col("text")))
    // exact dedup keeps the min-id copy of each duplicated text
    val cleaned = Dedup.dropExactDuplicates(withDups, "doc_id", "text")
    assert(cleaned.count() == 30)
    assert(cleaned.filter(col("doc_id") >= 5000).count() == 0)
    // near-dup pairs at high threshold find exactly the planted copies
    val pairs = Dedup.nearDuplicatePairs(withDups, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 4L).map(i => (i, i + 5000)).toSet
    assert(planted.subsetOf(pairs), s"missing ${planted -- pairs}")
  }

  test("dedup: duplicate-span stats count cross-doc spans only") {
    import spark.implicits._
    val shared = "a b c d e f g h" // one 8-token span, planted in docs 1 and 2
    val docs = Seq(
      (1L, s"$shared p q r s t u v w"), // 16 tokens -> 9 spans, 1 shared
      (2L, s"z y $shared"), //              10 tokens -> 3 spans, 1 shared
      (3L, "m n o p q r s t"), //           unique single span
      (4L, "one two three"), //             under k tokens -> no spans
      (5L, "a a a a a a a a a a") //        self-repeats are NOT cross-doc dups
    ).toDF("doc_id", "text")
    val stats = Dedup.duplicateSpanStats(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(stats(1L) == ((9L, 1L, 1.0 / 9.0)))
    assert(stats(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(stats(3L)._2 == 0L)
    assert(stats(5L) == ((3L, 0L, 0.0)))
    assert(!stats.contains(4L))
  }

  test("dedup: substring excision keeps first occurrence, cuts the rest, merges spans") {
    import spark.implicits._
    val shared = "a b c d e f g h" // one 8-token span, planted in docs 1-3
    val docs = Seq(
      (1L, s"$shared tail1 tail2"), //            first occurrence -> kept whole
      (2L, s"lead1 lead2 $shared"), //            later occurrence -> span cut
      (3L, s"$shared i j"), // "b c d e f g h i" + "c..i j"? no — only the planted span repeats
      (4L, "one two three"), //                   under k tokens -> untouched
      (5L, shared + " " + shared) //              both copies post-date doc 1's
    ).toDF("doc_id", "text")
    val out = Dedup.exciseDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    // doc 1 holds the corpus-wide first occurrence: nothing cut
    assert(out(1L) == ((10L, 0L, 0L, "a b c d e f g h tail1 tail2")))
    // doc 2's copy is cut; the lead tokens survive
    assert(out(2L) == ((10L, 1L, 8L, "lead1 lead2")))
    // doc 3 starts with the shared span; its unique suffix survives
    assert(out(3L)._4 == "i j")
    // under-k docs flow through untouched
    assert(out(4L) == ((3L, 0L, 0L, "one two three")))
    // doc 5: both its copies post-date doc 1's keeper, so the cut
    // windows [1,8] and [9,16] merge into one island covering the doc
    assert(out(5L) == ((16L, 1L, 16L, "")))
  }

  test("dedup: incremental flags classify exact, near, and novel batch docs") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    val batch = corpus.filter(col("doc_id") === 2).select((col("doc_id") + 9000).as("doc_id"), col("text"))
      .union(corpus.filter(col("doc_id") === 3)
        .select((col("doc_id") + 9000).as("doc_id"), concat(col("text"), lit(" x")).as("text")))
      .union(Seq((9999L, "entirely novel text sharing no shingles with the corpus at all"))
        .toDF("doc_id", "text"))
    val flags = Dedup.incrementalDedupFlags(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(flags(9002L)._1, "verbatim copy must flag exact_dup")
    assert(!flags(9002L)._3 && !flags(9003L)._3, "dup docs must not keep")
    assert(!flags(9003L)._1 && flags(9003L)._2, "tiny edit: not exact, but an LSH near-dup")
    assert(flags(9999L) == ((false, false, true)), "novel doc keeps")
  }

  test("dedup: simhash near pairs find planted near-duplicates") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(20)
    val withDups = docs
      .union(docs.filter(col("doc_id") === 1)
        .select(col("doc_id") + 7000, concat(col("text"), lit(" x")).as("text")))
    val pairs = Dedup.simhashNearPairs(withDups, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 7001L)))
    assertThrows[IllegalArgumentException](
      Dedup.simhashNearPairs(withDups, "doc_id", "text", maxHamming = 6))
  }

  test("graph: connected components labels chains and keeps singletons apart") {
    import spark.implicits._
    // two chains (0-1-2-3, 10-11) and an isolated pair (20,21)
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val cc = Graph.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(cc(_) == 0L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(20L) == 20L && cc(21L) == 20L)
    val summary = Graph.componentSummary(
      Graph.connectedComponents(pairs, "doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(summary == Map(0L -> 4L, 10L -> 2L, 20L -> 2L))
  }

  test("graph: large-star/small-star CC converges in O(log n) rounds on a deep path") {
    import spark.implicits._
    // A 257-node path (diameter 256): min-label propagation needs ~256
    // rounds; star CC must finish in O(log n) — maxIter = 12 proves it
    // (2^12 >> 257, while 12 << 256 rules out diameter-bound behavior).
    val path = (0L until 256L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Graph.connectedComponentsStar(path, "a", "b", maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 257)
    assert(cc.values.forall(_ == 0L), "single component rooted at the min id")
  }

  test("graph: triangle stats match closed forms on K4, a path, and a star") {
    import spark.implicits._
    def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Double) = {
      val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    // K4: C(4,3)=4 triangles, every wedge closed -> clustering exactly 1.0;
    // edges fed unordered + duplicated to prove canonicalization
    val k4 = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L), (2L, 1L))
    assert(stats(k4) == ((4L, 6L, 12L, 4L, 1.0)))
    // path 0-1-2-3: 2 wedges, no triangles
    assert(stats(Seq((0L, 1L), (1L, 2L), (2L, 3L))) == ((4L, 3L, 2L, 0L, 0.0)))
    // star (hub 0, 5 leaves): the celebrity-node case the degree
    // orientation exists for — C(5,2)=10 wedges, 0 triangles
    assert(stats((1L to 5L).map(i => (0L, i))) == ((6L, 5L, 10L, 0L, 0.0)))
    // triangle + pendant: 3 triangles' worth of wedges at the triangle
    // (plus 2 via the degree-3 node) -> 3*1 + 2 extra = 5 wedges, 1 triangle
    assert(stats(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) == ((4L, 4L, 5L, 1L, 0.6)))
  }

  test("graph: star CC matches propagation CC on random graphs (+ self-pairs)") {
    import spark.implicits._
    val rng = new scala.util.Random(42) // fixed seed: deterministic spec
    val edges = Seq.fill(300)((rng.nextInt(120).toLong, rng.nextInt(120).toLong)) :+ (200L, 200L)
    val pairs = edges.toDF("a", "b")
    val star = Graph.connectedComponentsStar(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Graph.connectedComponents(pairs, "a", "b", maxIter = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
    assert(star(200L) == 200L, "self-pair id labels itself")
  }

  test("graph: k-core peels pendant chains down to the dense backbone") {
    import spark.implicits._
    // K5 (ids 1-5, every degree 4) with a pendant chain 1-10-11-12
    // hanging off it: 3-core = exactly the K5. The chain forces a
    // CASCADE (12 falls first, then 11, then 10) — multiple peel rounds,
    // not one — and the K5 degrees must come back UNchanged.
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val chain = Seq((1L, 10L), (10L, 11L), (11L, 12L))
    val pairs = (k5 ++ chain).toDF("a", "b")
    val core3 = Graph.kCore(pairs, "a", "b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    // k above the max degree: the whole graph peels away
    assert(Graph.kCore(pairs, "a", "b", k = 5).isEmpty)
    // already-a-core input (K4 at k=3): nothing to peel, degrees intact
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("a", "b")
    val core = Graph.kCore(k4, "a", "b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("multimodal: dHash is invariant under pixel-doubling (perceptual, not byte)") {
    import spark.implicits._
    // a 9x8 gray image and its 18x16 pixel-doubled copy: different bytes
    // (md5 dedup is blind to that), same dHash — the invariance that
    // makes the hash perceptual. A one-pixel edit must change the hash.
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val head = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      head ++ Array.tabulate(w * h * 3)(i => px((i / 3) % w, i / 3 / w).toByte)
    }
    def base(x: Int, y: Int): Int = (x * 31 + y * 17) % 256
    val items = Seq(
      (1L, ppm(9, 8, base)),
      (2L, ppm(18, 16, (x, y) => base(x / 2, y / 2))), // pixel-doubled copy
      (3L, ppm(9, 8, (x, y) => if (x == 4 && y == 4) 255 else base(x, y))))
      .toDF("media_id", "payload")
    val hashes = Multimodal.dhash64(items, "media_id", "payload", Multimodal.PpmDecoder)
      .collect().map(d => d.mediaId -> ((d.dhashHi, d.dhashLo))).toMap
    assert(hashes(1L) == hashes(2L), "doubled copy must collide")
    assert(hashes(1L) != hashes(3L), "a visible edit must not collide")
  }

  test("aggregation: HLL approx distinct within bounded error of exact counts") {
    // approx_count_distinct at rsd=0.02: assert within 10% (5 sigma) of
    // dist01's exact counts. Sketches can't hash-match a DuckDB oracle,
    // so this spec IS the correctness gate for the HLL operator.
    val exact = RelationalQueries.defs("dist01_distinct_counts")(spark, sf0001).head()
    val approx = ExtendedQueries.approxDistinct(spark, sf0001).head()
    def relErr(a: Long, e: Long) = math.abs(a - e).toDouble / e
    assert(relErr(approx.getLong(0), exact.getLong(0)) <= 0.10, "approx_parts off")
    assert(relErr(approx.getLong(1), exact.getLong(2)) <= 0.10, "approx_orders off")
    assert(approx.getLong(2) > 0)
  }

  test("profiling: prof03 approx distincts stay within 10% of prof01 exact counts") {
    // prof03 is the corpus-scale profile (HLL per column, no Expand);
    // its values can't hash-match a DuckDB oracle, so this spec IS its
    // value gate: per column, the estimate must sit within 10% (5 sigma
    // at rsd=0.05 default... conservatively wide) of prof01's exact
    // n_distinct, and the exact columns (n_rows, n_nulls) must agree.
    import graft.queries.ProfilingQueries
    val exact = ProfilingQueries.defs("prof01_column_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = ProfilingQueries.alternates("prof03_approx_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (colName, (nRows, nNulls, nd)) =>
      val (eRows, eNulls, eNd) = exact(colName)
      assert(nRows == eRows && nNulls == eNulls, s"$colName exact stats differ")
      assert(math.abs(nd - eNd).toDouble <= math.max(1.0, 0.10 * eNd),
        s"$colName approx distinct $nd too far from exact $eNd")
    }
  }

  test("profiling: prof05 KMV distincts are exact under k and within 15% above it") {
    // The oracle gate proves cross-engine bit-parity; this spec pins the
    // ESTIMATOR contract against ground truth: columns with fewer than
    // k=256 distinct values report the exact count (the bottom-k set IS
    // the value set), high-cardinality columns land within the
    // ~1/sqrt(k-2) KMV error band (15% ~ 2.4 sigma at k=256).
    import graft.queries.ProfilingQueries
    val exact = ProfilingQueries.defs("prof01_column_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val kmv = ProfilingQueries.defs("prof05_kmv_profile")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(kmv.keySet == exact.keySet)
    kmv.foreach { case (colName, (nRows, nNulls, nd)) =>
      val (eRows, eNulls, eNd) = exact(colName)
      assert(nRows == eRows && nNulls == eNulls, s"$colName exact stats differ")
      if (eNd < 256)
        assert(nd == eNd.toDouble, s"$colName under-k KMV must be exact: $nd vs $eNd")
      else
        assert(math.abs(nd - eNd) <= 0.15 * eNd,
          s"$colName KMV estimate $nd too far from exact $eNd")
    }
  }

  test("aggregation: HLL sketches persist and merge within sketch error of global") {
    // The 100 TB distinct-count pattern: build one DataSketches HLL per
    // partition (day), persist, and answer any date-range query by
    // MERGING sketches instead of rescanning. HLL state is
    // insertion-order independent, but a unioned sketch and a
    // directly-updated one may use different estimators once dense
    // (composite vs HIP), so the contract is agreement within sketch
    // error — not bit equality — plus both close to the exact count.
    import org.apache.spark.sql.functions._
    val ev = graft.queries.Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
    val perDay = ev.groupBy("day").agg(hll_sketch_agg(col("user_id")).as("sk"))
    assert(perDay.count() > 10, "fixture should span many days")
    val merged = perDay.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")).head().getLong(0)
    val global = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est")).head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    def close(a: Long, b: Long) = math.abs(a - b).toDouble / math.max(b, 1L) <= 0.05
    assert(close(merged, global), s"merged $merged vs global $global")
    assert(close(merged, exact) && close(global, exact),
      s"estimates $merged/$global vs exact $exact")
  }

  test("aggregation: approx_percentile within bounded rank error of exact percentiles") {
    // approx_percentile's accuracy knob bounds RANK error (not value
    // error): with accuracy a, the returned value's rank is within
    // n/a of the target rank. Like HLL, the sketch can't hash-match a
    // DuckDB oracle, so this bound IS its gate; n07 stays the exact path.
    import org.apache.spark.sql.functions._
    val li = graft.queries.Tables.t(spark, sf0001, "lineitem")
      .select(col("l_quantity").cast("double").as("q"))
    val n = li.count()
    val acc = 1000
    val approx = li.agg(
      expr(s"approx_percentile(q, array(0.25, 0.5, 0.75), $acc)")).head().getSeq[Double](0)
    val sorted = li.orderBy("q").collect().map(_.getDouble(0))
    Seq(0.25, 0.5, 0.75).zip(approx).foreach { case (p, v) =>
      val target = (p * n).toLong
      // values are discrete with ties: the returned value occupies the
      // whole rank interval [count(<v), count(<=v)] — the guarantee is
      // that the TARGET rank falls within n/acc of that interval
      val lo = sorted.count(_ < v).toLong
      val hi = sorted.count(_ <= v).toLong
      assert(target >= lo - n / acc - 1 && target <= hi + n / acc + 1,
        s"p$p: value $v spans ranks [$lo,$hi], target $target, n=$n")
    }
  }

  test("dedup: simhash of identical texts identical; near texts close in Hamming") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("simhash_spec")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "the quick brown fox jumps over the lazy cat again and again today"),
      (4L, "completely different content about spark shuffle partitions and joins"))
      .toDF("doc_id", "text").write.parquet(tmp.resolve("documents.parquet").toString)
    val sh = DedupQueries.defs("dd05_simhash")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(2L))
    assert(hamming(sh(1L), sh(3L)) <= 8)
    assert(hamming(sh(1L), sh(4L)) > hamming(sh(1L), sh(3L)))
  }

  test("multimodal: implausible header dimensions refuse BEFORE " +
      "allocating; the quarantine turns them into ok=false rows") {
    import graft.ops.Multimodal._
    // a crafted PPM claiming 60000x60000 would allocate ~10 GB RGB —
    // the dims guard must refuse without touching the raster
    val huge = "P6\n60000 60000\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val e = intercept[IllegalArgumentException] {
      PpmDecoder.decodePixels(MediaItem(7L, huge))
    }
    assert(e.getMessage.contains("implausible dimensions"), e.getMessage)
    // a malformed width token refuses instructively, not NumberFormat
    val bad = "P6\nxyz 2\n255\n".getBytes("US-ASCII")
    val e2 = intercept[IllegalArgumentException] {
      PpmDecoder.decodePixels(MediaItem(8L, bad))
    }
    assert(e2.getMessage.contains("malformed PPM width"), e2.getMessage)
    // through the quarantine both become rows, and good payloads decode
    import spark.implicits._
    val ok = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 10, 10)
    val df = Seq((1L, ok), (2L, huge), (3L, bad)).toDF("media_id", "payload")
    val rows = mediaProfileQuarantine(df, "media_id", "payload",
        PpmDecoder, 1, 1).collect().sortBy(_.mediaId)
    assert(rows.map(_.ok).toSeq == Seq(true, false, false))
    assert(rows.head.width == 1 && rows.head.meanLuma == 10.0)
    assert(rows(1).err == "IllegalArgumentException")
  }
}
