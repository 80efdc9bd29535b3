package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Multimodal-column queries: `documents.text` bytes stand in for media
  * payloads (this environment ships no media fixtures or codecs — see
  * graft.ops.Multimodal for the pluggable decoder design). The queries
  * exercise the real plumbing: binary columns, metadata extraction,
  * frame-index explosion. The column-expression forms here are the
  * codegen'd fast path; MultimodalSpec covers the mapPartitions Decoder
  * path and asserts it produces exactly these rows.
  */
object MultimodalQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- mm01: payload -> typed metadata (decode stub semantics: pure
    // function of the bytes; see Multimodal.FakeDecoder).
    "mm01_media_metadata" -> ((spark: SparkSession, dir: String) => {
      val docs = t(spark, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
      docs.select(
          col("media_id"),
          length(col("payload")).as("byte_len"),
          md5(col("payload")).as("content_hash"),
          (length(col("payload")) % 640).as("width"),
          (length(col("payload")) * 7 % 480).as("height"),
          (length(col("payload")) % 30 + 1).as("frame_count"))
        .orderBy("media_id")
    }),

    // ---- mm02: frame sampling — explode metadata (never payloads) into
    // per-frame rows; every 5th frame.
    "mm02_frame_sample" -> ((spark: SparkSession, dir: String) => {
      val meta = t(spark, dir, "documents")
        .select(col("doc_id").as("media_id"),
          md5(col("text").cast("binary")).as("content_hash"),
          (length(col("text").cast("binary")) % 30 + 1).as("frame_count"))
      meta.select(col("media_id"), col("content_hash"), col("frame_count"),
          explode(sequence(lit(0), col("frame_count") - 1, lit(5))).as("frame_idx"))
        .withColumn("frame_fp", md5(concat(col("content_hash"), lit(":"), col("frame_idx"))))
        .select(col("media_id"), col("frame_count"), col("frame_idx"), col("frame_fp"))
        .orderBy("media_id", "frame_idx")
    }),
    // ---- mm03: REAL pixel decode in the gate — each doc gets a
    // deterministic 4x2 binary-PPM payload (gray pixel j carries value
    // (doc_id*7 + j*13) % 256), graft.ops.Multimodal.PpmDecoder decodes
    // ACTUAL bytes-to-raster (header parse, raster slice), and the
    // integer Rec.601 luma of a gray pixel collapses to its value — so
    // the oracle states the expected stats in closed form without
    // needing a PPM parser. Proves the pixel path end-to-end, not just
    // the metadata plumbing; JPEG/PNG stay behind the documented stub.
    "mm03_ppm_pixel_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n4 2\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(24)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            (id, head ++ px)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm04: REAL decode -> nearest-neighbor resize (the thumbnail /
    // fixed-input-size step before a vision encoder) -> thumbnail luma
    // stats. Same 4x2 gray PPM fixture as mm03; the 2x1 thumbnail's
    // floor mapping samples source pixels (0,0) and (2,0) — gray values
    // j=0 and j=2 — so the oracle states the expected stats in closed
    // form without a PPM parser or resampler. The resize kernel itself
    // is pinned byte-exact (down AND up) in OpsSpec.
    "mm04_thumbnail_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n4 2\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(24)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            (id, head ++ px)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.thumbnailStats(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder, outW = 2, outH = 1)
        .toDF()
        .select(col("mediaId").as("media_id"),
          col("srcWidth").as("src_w"), col("srcHeight").as("src_h"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm05: perceptual near-dup — REAL decode -> 9x8 dHash ->
    // group identical hashes into duplicate classes (min-id keeper),
    // the image analogue of dd01's exact dedup: re-encoded or
    // pixel-doubled copies share a dHash while their bytes (and md5)
    // differ. Fixture: 9x8 gray PPMs synthesized from doc_id (pixel
    // p = (id*7 + p*13) % 256), so the oracle states every gradient
    // bit in closed form; the gray ramp repeats with id period 256,
    // which gives the fixture genuine multi-member classes. The hash
    // is computed by the general decode->resize->luma path (OpsSpec
    // pins the scale-invariance that makes it perceptual); the class
    // rollup is one keyed window over (hi, lo) — never a pair join.
    "mm05_perceptual_dupes" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n9 8\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(216)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            (id, head ++ px)
          }
        }
        .toDF("media_id", "payload")
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash_hi"), col("dhash_lo"))
      graft.ops.Multimodal.dhash64(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"),
          col("dhashHi").as("dhash_hi"), col("dhashLo").as("dhash_lo"))
        .withColumn("keeper_id", min(col("media_id")).over(byHash))
        .withColumn("n_same", count(lit(1)).over(byHash))
        .withColumn("is_dup", col("media_id") =!= col("keeper_id"))
        .orderBy("media_id")
    }),

    // ---- mm06: REAL audio decode in the gate — the WAV analogue of
    // mm03's pixel path, completing the image/audio/video modality
    // triple (video = mm02's frame sampling over metadata). Each doc
    // gets a deterministic 64-sample 8 kHz mono PCM WAV (sample i
    // carries ((doc_id*31 + i*57) % 4096) - 2048, a +-2048 sawtooth);
    // graft.ops.Multimodal.WavDecoder walks ACTUAL RIFF chunks
    // (header parse, fmt validation, LE int16 raster), and the stats
    // an audio-ingest quality gate needs (duration, peak, mean-square
    // level, near-full-scale clip count) are exact integer sums — so
    // the oracle states them in closed form without a WAV parser.
    // MP3/AAC stay behind the documented stub, same rule as JPEG/PNG.
    "mm06_wav_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 64
            val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
              .put("WAVE".getBytes("US-ASCII"))
              .put("fmt ".getBytes("US-ASCII")).putInt(16)
              .putShort(1).putShort(1).putInt(8000).putInt(16000)
              .putShort(2).putShort(16)
              .put("data".getBytes("US-ASCII")).putInt(n * 2)
            var i = 0
            while (i < n) {
              bb.putShort((((id * 31 + i * 57) % 4096) - 2048).toShort)
              i += 1
            }
            (id, bb.array())
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.audioStats(payloads, "media_id", "payload")
        .toDF()
        .select(col("mediaId").as("media_id"),
          col("sampleRate").as("sample_rate"), col("nFrames").as("n_frames"),
          col("durationMs").as("duration_ms"), col("peak"),
          col("meanSquare").as("mean_square"), col("nClip").as("n_clip"))
        .orderBy("media_id")
    }),

    // ---- mm07: REAL PNG decode in the gate — each doc's 9x8 gray ramp
    // (same pixel formula as mm05) is encoded as an ACTUAL PNG (RGB,
    // bit depth 8: signature, IHDR, a DEFLATE'd IDAT, CRC'd chunks)
    // with row y carrying filter type y % 5 — so decoding exercises
    // every unfilter path (None/Sub/Up/Average/Paeth) plus a real
    // Inflater round-trip, per row, per document. The oracle states the
    // luma stats in closed form from the pixel formula: hash-equality
    // proves the decoder recovered every byte of the raster. JPEG stays
    // behind the documented stub (entropy codec, no JDK primitive).
    "mm07_png_pixel_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val rgb = new Array[Byte](9 * 8 * 3)
            var p = 0
            while (p < 72) {
              val v = ((id * 7 + p * 13) % 256).toByte
              rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
              p += 1
            }
            val img = graft.ops.Multimodal.PixelImage(9, 8, rgb)
            (id, graft.ops.Multimodal.PngEncoder.encode(img, y => y % 5))
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Multimodal.PngDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm08: REAL baseline-JPEG decode in the gate — the dominant
    // training-corpus image format, pure JVM (graft.ops.Jpeg: marker
    // parse, Huffman, dequant, 8x8 IDCT, level shift). Fixture: per-doc
    // solid-gray 16x16 with v = 128 + 2*((doc_id*7) % 57 - 28): a
    // constant block is DC-only, and with the flat q=16 table an even
    // (v-128) offset survives quantization EXACTLY (DC = (v-128)/2,
    // IDCT of a lone DC is the constant 2*DC), so the oracle states the
    // stats in closed form with no JPEG parser — mm03's PPM discipline
    // applied to a lossy entropy codec. JpegSpec pins the general
    // paths (arbitrary coefficients vs an independent reference IDCT,
    // 4:2:0 chroma, restart markers, progressive refusal).
    "mm08_jpeg_pixel_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val v = (128 + 2 * ((id * 7) % 57 - 28)).toInt
            (id, graft.ops.Jpeg.JpegEncoder.solidGray(16, 16, v))
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Jpeg.JpegDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm15: REAL progressive-JPEG decode in the gate — the one
    // image refusal a 100 TB web corpus actually hits at volume (a
    // large share of web JPEGs are SOF2). Fixture: per-doc solid-gray
    // 16x16 with v = 128 + 2*((doc_id*11) % 53 - 26), delivered
    // through the full Annex G scan script (DC first + refinement,
    // split spectral AC bands, successive approximation) — the decoder
    // reassembles the coefficients across SIX scans before one IDCT,
    // and the oracle still states the stats in closed form because the
    // final coefficients equal the baseline encoding's. JpegSpec pins
    // progressive == baseline on arbitrary-coefficient and 4:2:0
    // interleaved fixtures (EOB runs, ZRL-in-refinement, newly-visible
    // coefficients).
    "mm15_progressive_jpeg_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val v = (128 + 2 * ((id * 11) % 53 - 26)).toInt
            (id, graft.ops.Jpeg.JpegEncoder.solidGrayProgressive(16, 16, v))
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Jpeg.JpegDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm16: EXIF metadata — the per-file pass a 100 TB image
    // corpus runs BEFORE any decode: orientation (with the 5-8
    // axis-swap normalization a thumbnail pipeline needs), camera
    // make, capture time, and the Exif-IFD pixel dims, parsed from a
    // real APP1 TIFF IFD riding a REAL decodable baseline JPEG (the
    // decoder skips APPn; the EXIF walker reads ONLY the leading
    // marker segments — bytes-of-header, never bytes-of-image).
    // Endianness alternates per doc so both TIFF byte orders are in
    // the gate. Oracle: every field in closed form from doc_id.
    "mm16_exif_metadata" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val ori = (id % 8 + 1).toInt
            val make = s"cam${id % 5}"
            val dt = f"2024:01:${id % 27 + 1}%02d 03:04:05"
            val jpeg = graft.ops.Exif.insertApp1(
              graft.ops.Jpeg.JpegEncoder.solidGray(24, 16, 100),
              graft.ops.Exif.app1Segment(ori, make, dt,
                pixelX = 24L + id % 7, pixelY = 16L,
                littleEndian = id % 2 == 0))
            val m = graft.ops.Exif.parse(jpeg).get
            val (nw, nh) = m.normalizedDims(24, 16)
            (id, m.orientation, m.make.get, m.dateTime.get,
              m.pixelX.get, m.pixelY.get, nw, nh)
          }
        }
        .toDF("media_id", "orientation", "make", "date_time",
          "pixel_x", "pixel_y", "norm_w", "norm_h")
        .orderBy("media_id")
    }),

    // ---- mm09: REAL video-container metadata (graft.ops.Mp4,
    // ISO-BMFF box parsing — no codec needed: at 100 TB the metadata
    // pass IS the video workload; frame decode happens later on the
    // tiny filtered subset). Fixture: per-doc minimal MP4 (ftyp +
    // mvhd + video/audio traks) with deterministic duration/dims/
    // sample counts, parsed back field-for-field — the oracle states
    // every extracted value in closed form. Mp4Spec pins largesize
    // framing, unknown-box skipping, and the overrun error contract.
    "mm09_mp4_metadata" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val bytes = graft.ops.Mp4.Mp4Encoder.minimal(
              timescale = 1000L, duration = (id % 3600) * 100 + 500,
              w = 320 + (id % 4).toInt * 160, h = 240 + (id % 4).toInt * 120,
              videoSamples = id % 250 + 1, audioSamples = (id % 250 + 1) * 2)
            val m = graft.ops.Mp4.parse(graft.ops.Multimodal.MediaItem(id, bytes))
            val v = m.tracks.find(_.handler == "vide").get
            val a = m.tracks.find(_.handler == "soun").get
            (id, m.brand, m.timescale, m.durationMs, m.tracks.size,
              v.codec, v.width, v.height, v.sampleCount, a.codec, a.sampleCount)
          }
        }
        .toDF("media_id", "brand", "timescale", "duration_ms", "n_tracks",
          "video_codec", "width", "height", "n_frames", "audio_codec",
          "n_audio_samples")
        .orderBy("media_id")
    }),

    // ---- mm10: REAL GIF decode in the gate (graft.ops.Gif: LZW with
    // variable-width codes — the last common image format off the
    // stub). Fixture: per-doc 9x8 GIF over a 256-entry GRAYSCALE
    // palette with index p = (doc_id*7 + p*13) % 256 — palette entry
    // i is (i,i,i), so luma == index and the oracle is mm07's
    // closed-form ramp verbatim; the LZW stream itself exercises
    // dictionary growth and CLEAR resets (GifSpec pins multi-frame
    // counting, sub-block framing, truncation errors).
    "mm10_gif_pixel_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val idx = Array.tabulate(72)(p => ((id * 7 + p * 13) % 256).toByte)
            (id, graft.ops.Gif.GifEncoder.encode(9, 8, idx))
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Gif.GifDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- mm11: REAL MP3 container metadata (graft.ops.Mp3 — frame
    // walk + ID3v2 tags; audio DECODE stays stubbed like video, the
    // metadata pass is the corpus workload). Fixture: per-doc ID3v2.3
    // tag + (doc_id % 120 + 10) valid MPEG-1 Layer III frames at
    // 128 kbps/44.1 kHz; every extracted field is closed-form,
    // including the exact sample-accurate duration.
    "mm11_mp3_metadata" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val bytes = graft.ops.Mp3.Mp3Encoder.encode(
              s"doc $id", s"src ${id % 7}", nFrames = (id % 120 + 10).toInt)
            val m = graft.ops.Mp3.parse(graft.ops.Multimodal.MediaItem(id, bytes))
            (id, m.mpegVersion, m.sampleRate, m.firstBitrateKbps, m.vbr,
              m.nFrames, m.durationMs, m.title, m.artist)
          }
        }
        .toDF("media_id", "mpeg_version", "sample_rate", "bitrate_kbps",
          "vbr", "n_frames", "duration_ms", "title", "artist")
        .orderBy("media_id")
    }),

    // ---- mm12: MIXED-FORMAT corpus through signature dispatch — the
    // capstone over every real image decoder: each doc's payload is a
    // DIFFERENT format by doc_id % 5 (PPM, BMP, PNG, GIF carry the
    // same 9x8 gray ramp; JPEG a 16x16 exactly-encodable solid), and
    // ONE pass routes by signature (Multimodal.SniffPixelDecoder) the
    // way a crawled corpus actually arrives. Formats 0-3 must produce
    // IDENTICAL stats (same pixels, four codecs); the JPEG branch is
    // mm08's closed form — so the oracle needs no decoder at all.
    // ---- mm13: REAL FLAC container metadata (graft.ops.Flac) — the
    // lossless-audio analogue of mm11: STREAMINFO gives sample-ACCURATE
    // duration (total_samples is stored, not estimated) plus the
    // spec-mandated raw-PCM MD5 (a pre-decode dedup fingerprint), and
    // Vorbis tags carry provenance. Fixture params derive from doc_id,
    // so the oracle states every field in closed form.
    "mm13_flac_metadata" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val bytes = graft.ops.Flac.FlacEncoder.encode(
              sampleRate = 44100, channels = (id % 2 + 1).toInt,
              bitsPerSample = 16, totalSamples = id * 100 + 1000,
              title = s"doc $id", artist = s"src ${id % 7}")
            val m = graft.ops.Flac.parse(graft.ops.Multimodal.MediaItem(id, bytes))
            (id, m.sampleRate, m.channels, m.bitsPerSample, m.totalSamples,
              m.durationMs, m.title, m.artist)
          }
        }
        .toDF("media_id", "sample_rate", "channels", "bits_per_sample",
          "total_samples", "duration_ms", "title", "artist")
        .orderBy("media_id")
    }),

    // ---- mm14: REAL baseline-TIFF decode (graft.ops.Tiff) — the
    // archival/scanned-document raster format: same 9x8 gray ramp as
    // mm07/mm10 (one oracle, N codecs), but encoded BIG-endian and
    // split into 3-row strips, so the gate pins the two TIFF-specific
    // hazards (byte-order handling, multi-strip assembly) on every doc.
    "mm14_tiff_pixel_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val rgb = new Array[Byte](9 * 8 * 3)
            var p = 0
            while (p < 72) {
              val v = ((id * 7 + p * 13) % 256).toByte
              rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
              p += 1
            }
            val img = graft.ops.Multimodal.PixelImage(9, 8, rgb)
            (id, graft.ops.Tiff.TiffEncoder.encode(
              img, littleEndian = false, rowsPerStrip = 3))
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Tiff.TiffDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    "mm12_mixed_corpus_stats" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val ppmHead = "P6\n9 8\n255\n".getBytes("US-ASCII")
          it.map { id =>
            def ramp = Array.tabulate(72)(p => ((id * 7 + p * 13) % 256).toByte)
            def rampRgb = {
              val rgb = new Array[Byte](72 * 3)
              var p = 0
              while (p < 72) {
                val v = ramp(p)
                rgb(p * 3) = v; rgb(p * 3 + 1) = v; rgb(p * 3 + 2) = v
                p += 1
              }
              graft.ops.Multimodal.PixelImage(9, 8, rgb)
            }
            val payload = (id % 5) match {
              case 0 => ppmHead ++ rampRgb.rgb
              case 1 => graft.ops.Multimodal.BmpEncoder.encode(rampRgb)
              case 2 => graft.ops.Multimodal.PngEncoder.encode(rampRgb, y => y % 5)
              case 3 => graft.ops.Gif.GifEncoder.encode(9, 8, ramp)
              case _ => graft.ops.Jpeg.JpegEncoder.solidGray(16, 16,
                (128 + 2 * ((id * 7) % 57 - 28)).toInt)
            }
            (id, payload)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.pixelStats(payloads, "media_id", "payload",
          graft.ops.Multimodal.SniffPixelDecoder)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("minLuma").as("min_luma"), col("maxLuma").as("max_luma"))
        .orderBy("media_id")
    }),

    // ---- c03: composed media pipeline — the third flagship
    // composition (c01 corpus curation, c02 vector ingestion): decode
    // ONCE per image, derive dimensions + full-image luma + perceptual
    // dHash + 2x1 thumbnail luma in a single mapPartitions pass
    // (Multimodal.mediaProfile), then the dedup-keeper rollup on top.
    // Run as separate queries, mm01/mm03/mm04/mm05 would decode the
    // corpus four times; at 100 TB the decode IS the cost, so the
    // pipeline shape — one decode, many derivations, relational rollups
    // on the skinny feature rows — is the point being gated. Same 9x8
    // fixture as mm05, so every feature has a closed-form oracle.
    "c03_media_pipeline" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n9 8\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(216)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            (id, head ++ px)
          }
        }
        .toDF("media_id", "payload")
      val byHash = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash_hi"), col("dhash_lo"))
      graft.ops.Multimodal.mediaProfile(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder, thumbW = 2, thumbH = 1)
        .toDF()
        .select(col("mediaId").as("media_id"), col("width"), col("height"),
          col("meanLuma").as("mean_luma"),
          col("dhashHi").as("dhash_hi"), col("dhashLo").as("dhash_lo"),
          col("thumbMeanLuma").as("thumb_mean_luma"))
        .withColumn("keeper_id", min(col("media_id")).over(byHash))
        .withColumn("is_kept", col("media_id") === col("keeper_id"))
        .orderBy("media_id")
    }),

    // ---- mm18: AUDIO near-dup — the WAV twin of mm17: a 63-bit
    // energy-gradient fingerprint (2-sample window energies, one bit
    // per adjacent comparison — ops.Multimodal.audioFingerprint) over
    // REAL RIFF/PCM decodes, then the same 16-bit banding makes
    // hamming<=3 search an equi-join with an exact popcount verify.
    // Fixture: each document contributes a 128-sample sawtooth (i^2
    // cross-term for fingerprint diversity) and a one-sample-perturbed
    // twin whose fingerprint differs by <= 2 bits.
    // ---- mm19: DECODE QUARANTINE — the permissive bad-record contract
    // (ing14) applied to media: every 7th payload is truncated mid-pixel
    // data, and the corpus profile must still complete with the corrupt
    // blobs surfaced as ok=false rows (zeroed features) instead of one
    // bad blob failing the task and the 100 TB job with it. Good rows
    // reuse mm03's closed-form gray-ramp fixture so the oracle states
    // every value exactly.
    "mm19_decode_quarantine" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n4 2\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(24)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            val full = head ++ px
            (id, if (id % 7 == 3) full.take(head.length + 5) else full)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.mediaProfileQuarantine(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder, thumbW = 2, thumbH = 1)
        .toDF()
        .select(col("mediaId").as("media_id"), col("ok"),
          col("width"), col("meanLuma").as("mean_luma"))
        .orderBy("media_id")
    }),

    // ---- mm20: MIXED-FORMAT quarantine — the crawl-corpus reality
    // mm19 idealizes away: ONE binary column holding whatever formats
    // arrived (PPM, BMP, PNG rotating by id), signature-dispatched to
    // the right REAL decoder (SniffPixelDecoder), with blobs nobody can
    // decode — an unknown signature (id%4=3) or a BMP truncated below
    // its own header (id%8=1) — quarantined as ok=false rows instead of
    // failing the job. All three real formats encode the SAME
    // closed-form gray raster, so the oracle states one luma for all of
    // them: format must not leak into features. Encoders run
    // partition-local in the fixture; payloads never shuffle.
    "mm20_mixed_format_quarantine" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = "P6\n4 2\n255\n".getBytes("US-ASCII")
          it.map { id =>
            val px = Array.tabulate(24)(i => ((id * 7 + (i / 3) * 13) % 256).toByte)
            val img = graft.ops.Multimodal.PixelImage(4, 2, px)
            val full = (id % 4) match {
              case 0 => head ++ px
              case 1 => graft.ops.Multimodal.BmpEncoder.encode(img)
              case 2 => graft.ops.Multimodal.PngEncoder.encode(img)
              case _ => Array.tabulate(32)(i => ((id + i * 17) % 251).toByte match {
                case b if b == 'P'.toByte || b == 'B'.toByte => (b + 1).toByte
                case b => b
              }) // no known signature
            }
            (id, if (id % 8 == 1) full.take(30) else full)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.mediaProfileQuarantine(payloads, "media_id", "payload",
          graft.ops.Multimodal.SniffPixelDecoder, thumbW = 2, thumbH = 1)
        .toDF()
        .select(col("mediaId").as("media_id"), col("ok"),
          col("width"), col("meanLuma").as("mean_luma"))
        .orderBy("media_id")
    }),

    // ---- mm26: REAL STEREO FLAC DECODE — the channel-assignment arm
    // of the format: independent L/R plus the three decorrelated pairs
    // (left/side, side/right, mid/side — integer decorrelation, the
    // side channel one bit wider, the mid's lost LSB restored from the
    // side's parity). Each document's L and R sawtooths encode with a
    // per-id assignment alternating with independent frames, decode
    // back interleaved, and per-channel sums + total energy must equal
    // the oracle's closed form of the ORIGINAL signals — a broken
    // reconstruction in any assignment breaks the hash. Decode is
    // partition-local; payloads never shuffle.
    "mm26_flac_stereo" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val l = Array.tabulate(192)(i =>
              (((id * 31 + i * 57 + i.toLong * i * (1 + id % 89)) % 4096) - 2048).toInt)
            val r = Array.tabulate(192)(i =>
              (((id * 37 + i * 41 + i.toLong * i * (2 + id % 83)) % 4096) - 2048).toInt)
            val mode = Seq(1, 8, 9, 10)((id % 4).toInt)
            val bytes = graft.ops.FlacPcm.FlacPcmEncoder.encodeStereo(
              l, r, 8000, blockSize = 64,
              modeFor = f => if (f % 2 == 0) mode else 1,
              orderFor = f => ((f + id) % 5).toInt,
              partitionOrder = 1)
            val dec = graft.ops.FlacPcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var sl = 0L; var sr = 0L; var en = 0L
            var i = 0
            while (i < dec.length) {
              if (i % 2 == 0) sl += dec(i) else sr += dec(i)
              en += dec(i).toLong * dec(i)
              i += 1
            }
            (id, dec.length.toLong, sl, sr, en)
          }
        }
        .toDF("media_id", "n_samples", "sum_left", "sum_right", "sum_energy")
        .orderBy("media_id")
    }),

    // ---- mm24: the FULL pixel-family quarantine — mm20 widened from
    // PPM/BMP/PNG to every real pixel decoder the sniffer routes:
    // PPM, BMP, PNG, baseline JPEG, GIF and TIFF rotate by id, all
    // encoding the SAME exactly-representable solid gray (JPEG's DCT
    // round-trips solid blocks bit-exactly at even values), so the
    // oracle states one luma whatever container held it. Two failure
    // arms cut across every format: a truncation below each format's
    // own header (id%4=1) and a signature nobody decodes (id%4=2) —
    // both land as ok=false rows in the same pass. Decode is
    // partition-local; payloads never shuffle.
    "mm24_pixel_family_quarantine" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val g = (2 * ((id * 7) % 128)).toInt
            val px = Array.fill(24)(g.toByte)
            val img = graft.ops.Multimodal.PixelImage(4, 2, px)
            val full = (id % 6) match {
              case 0 => "P6\n4 2\n255\n".getBytes("US-ASCII") ++ px
              case 1 => graft.ops.Multimodal.BmpEncoder.encode(img)
              case 2 => graft.ops.Multimodal.PngEncoder.encode(img)
              case 3 => graft.ops.Jpeg.JpegEncoder.solidGray(16, 16, g)
              case 4 => graft.ops.Gif.GifEncoder.encode(4, 2,
                Array.fill(8)(g.toByte))
              case _ => graft.ops.Tiff.TiffEncoder.encode(img)
            }
            val out = (id % 4) match {
              case 1 => full.take(14) // below every format's header
              case 2 => Array.tabulate(32)(i => ((id + i * 17) % 251).toByte match {
                case b if b == 'P'.toByte || b == 'B'.toByte => (b + 1).toByte
                case b => b
              }) // no known signature (mm20's collision-free generator)
              case _ => full
            }
            (id, out)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.mediaProfileQuarantine(payloads, "media_id", "payload",
          graft.ops.Multimodal.SniffPixelDecoder, thumbW = 2, thumbH = 1)
        .toDF()
        .select(col("mediaId").as("media_id"), col("ok"),
          col("width"), col("meanLuma").as("mean_luma"))
        .orderBy("media_id")
    }),

    // ---- mm25: the AUDIO/VIDEO metadata quarantine twin — the same
    // good/corrupt/unknown discipline over the container-metadata
    // family: MP4, MP3, FLAC and MJPEG-AVI rotate by id, each good
    // blob serving its typed metadata in closed form, while a
    // truncated header (id%3=1) or an unknown signature (id%3=2)
    // lands as an ok=false row. The dispatch is the STRICT sniffer
    // (SniffMetaDecoder): an unknown blob refuses rather than falling
    // back to the deterministic stub — a quarantine that fabricated
    // metadata would count garbage as healthy corpus.
    "mm25_media_meta_quarantine" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val full = (id % 4) match {
              case 0 => graft.ops.Mp4.Mp4Encoder.minimal(
                timescale = 1000L, duration = (id % 360) * 100 + 500,
                w = 320, h = 240,
                videoSamples = id % 250 + 1, audioSamples = (id % 250 + 1) * 2)
              case 1 => graft.ops.Mp3.Mp3Encoder.encode(
                s"doc $id", s"src ${id % 7}", nFrames = (id % 120 + 10).toInt)
              case 2 => graft.ops.Flac.FlacEncoder.encode(
                sampleRate = 44100, channels = 1, bitsPerSample = 16,
                totalSamples = id * 100 + 1000,
                title = s"doc $id", artist = s"src ${id % 7}")
              case _ => graft.ops.Avi.AviMjpegEncoder.encode(
                (0 until 2).map(k => graft.ops.Jpeg.JpegEncoder.solidGray(
                  16, 16, (2 * ((id * 7 + k * 13) % 128)).toInt)),
                16, 16, usPerFrame = 40000)
            }
            val out = (id % 3) match {
              case 1 => full.take(16) // mid-header for all four formats
              case 2 => Array.tabulate(32)(i => ((id + i * 17) % 251).toByte match {
                case b if b == 'P'.toByte || b == 'B'.toByte => (b + 1).toByte
                case b => b
              })
              case _ => full
            }
            (id, out)
          }
        }
        .toDF("media_id", "payload")
      graft.ops.Multimodal.decodeMetaQuarantine(payloads, "media_id", "payload")
        .toDF()
        .select(col("mediaId").as("media_id"), col("ok"),
          col("width"), col("height"), col("frameCount").as("frame_count"))
        .orderBy("media_id")
    }),

    // ---- mm21: REAL VIDEO FRAME DECODE — MJPEG in AVI. The "video
    // codecs stay stubbed" boundary is for inter-frame codecs; Motion
    // JPEG's frames are independent baseline JPEGs, which this repo
    // decodes for real (ops.Jpeg), and the AVI container is public
    // RIFF layout (ops.Avi). Each document contributes a 3-frame
    // 16x16 MJPEG AVI of exactly-encodable solid grays; the query
    // extracts container metadata AND pixel-decodes frame 0 through
    // the same JPEG decoder the image corpus uses — the oracle states
    // every field including the frame's mean luma in closed form.
    // 100 TB shape: metadata is a header walk; frame decode is
    // partition-local on the payload column, payloads never shuffle.
    "mm21_mjpeg_video" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val frames = (0 until 3).map { k =>
              graft.ops.Jpeg.JpegEncoder.solidGray(16, 16,
                2 * (((id * 7 + k * 13) % 128).toInt))
            }
            val bytes = graft.ops.Avi.AviMjpegEncoder.encode(
              frames, 16, 16, usPerFrame = 40000)
            val item = graft.ops.Multimodal.MediaItem(id, bytes)
            val m = graft.ops.Avi.decodeMeta(item)
            val f0 = graft.ops.Avi.decodeFrame(item, 0)
            val n = f0.width * f0.height
            var s = 0L; var i = 0
            while (i < n) { s += (f0.rgb(i * 3) & 0xff); i += 1 }
            (id, m.frameCount.toLong, m.width.toLong, m.height.toLong,
              m.codec, m.durationUs, s.toDouble / n)
          }
        }
        .toDF("media_id", "frame_count", "width", "height",
          "codec", "duration_us", "frame0_luma")
        .orderBy("media_id")
    }),

    // ---- mm22: REAL FLAC SAMPLE DECODE — compressed audio leaves the
    // stub (ops.FlacPcm): CRC-verified frames, CONSTANT/VERBATIM/FIXED
    // subframes, Rice-partitioned residuals. FLAC is lossless, so the
    // gate is exact: each document's sawtooth PCM (mm18's formula)
    // encodes with a per-id subframe mix (all five fixed orders + the
    // verbatim path across the corpus, two Rice partitions per frame),
    // decodes back, and the decoded sample count / sum / energy must
    // equal the oracle's closed-form statement of the ORIGINAL signal —
    // one wrong residual anywhere breaks the hash. Decode is
    // partition-local; payloads never shuffle.
    "mm22_flac_pcm" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val s = Array.tabulate(128)(i =>
              (((id * 31 + i * 57 + i.toLong * i * (1 + id % 89)) % 4096) - 2048).toInt)
            val order = (id % 7) match {
              case 5 | 6 => -1 // verbatim arm (mixed with fixed-2 frames)
              case k => k.toInt
            }
            val bytes = graft.ops.FlacPcm.FlacPcmEncoder.encode(
              s, 8000, blockSize = 64,
              orderFor = f => if (order == -1 && f % 2 == 1) 2 else order,
              partitionOrder = 1)
            val dec = graft.ops.FlacPcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var sum = 0L; var energy = 0L
            dec.foreach { v => sum += v; energy += v.toLong * v }
            (id, dec.length.toLong, sum, energy)
          }
        }
        .toDF("media_id", "n_samples", "sum_samples", "sum_energy")
        .orderBy("media_id")
    }),

    // ---- mm29: the FLAC DEPTH MATRIX — every sample size the frame
    // header can name besides 32 (8/12/16/20/24, codes 1/2/4/5/6)
    // round-trips through one gate, depth cycling by id and the signal
    // range-scaled to each depth so every sample exercises the full
    // coded width. Mixed FIXED orders and two Rice partitions per
    // frame as in mm22. Lossless, so the oracle restates the original
    // depth-scaled signal closed-form — one wrong sample-size decode
    // (sign extension, residual width) anywhere breaks the hash.
    "mm29_flac_depth_matrix" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val bps = Seq(8, 12, 16, 20, 24)((id % 5).toInt)
            val span = 1L << bps
            val s = Array.tabulate(128)(i =>
              (((id * 31 + i * 57 + i.toLong * i * (1 + id % 89)) % span) - span / 2).toInt)
            val bytes = graft.ops.FlacPcm.FlacPcmEncoder.encode(
              s, 8000, blockSize = 64,
              orderFor = f => ((f + id) % 5).toInt,
              partitionOrder = 1, bps = bps)
            val dec = graft.ops.FlacPcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var sum = 0L; var energy = 0L
            dec.foreach { v => sum += v; energy += v.toLong * v }
            (id, bps.toLong, dec.length.toLong, sum, energy)
          }
        }
        .toDF("media_id", "bits_per_sample", "n_samples", "sum_samples", "sum_energy")
        .orderBy("media_id")
    }),

    // ---- mm30: REAL G.711 DECODE (ops.G711) — the telephony corpus
    // formats (WAVE tags 6/7: A-law and µ-law companding), the third
    // compressed-audio codec to leave the stub. G.711 expands each
    // byte by exactly-specified integer arithmetic (sign, segment,
    // mantissa, bias), so the gate is fully exact: each document's
    // payload is a quadratic byte series shifted by id (the shift
    // sweeps every code point across the corpus, and per-doc sums stay
    // id-dependent), the law alternates by id parity, and the oracle
    // restates the expansion formula in SQL — one wrong segment shift
    // or sign anywhere breaks the hash.
    // Decode is partition-local; payloads never shuffle.
    // ---- mm31: REAL VP8L (lossless WebP) DECODE (ops.Webp) — the
    // modern web-corpus image format, until now the highest-volume
    // refusal a real crawl hit. Four encoder paths interleave across
    // documents — plain canonical prefix codes, the subtract-green
    // transform, a 4-bit color cache, and an LZ77 backward reference
    // (the last row copied from the row above, distance = plane code
    // (0,1)) — and every path must reproduce the ORIGINAL pixels
    // exactly: VP8L is lossless, so the oracle restates the raster's
    // closed form and one wrong prefix code, cache slot, transform
    // inverse, or copied pixel anywhere breaks the hash. Decode is
    // partition-local; payloads never shuffle.
    "mm31_webp_lossless" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          import graft.ops.Webp
          import graft.ops.Webp.Vp8lEncoder.{Lit, Ref}
          it.map { id =>
            val w = 8 + (id % 5).toInt
            val h = 6 + (id % 3).toInt
            def px(x: Int, y: Int): Int =
              0xFF000000 |
                ((((x * 7 + y * 13 + id) % 256).toInt) << 16) |
                ((((x * 3 + y * 5 + 2 * id) % 256).toInt) << 8) |
                (((x * 11 + y * 2 + 3 * id) % 256).toInt)
            val pixels = for (y <- 0 until h; x <- 0 until w) yield px(x, y)
            val bytes = (id % 4) match {
              case 0 => Webp.Vp8lEncoder.encode(w, h, pixels.map(Lit(_)))
              case 1 => // tokens carry subtract-green residuals
                val res = pixels.map { p =>
                  val g = (p >> 8) & 0xFF
                  (p & 0xFF00FF00) |
                    (((((p >> 16) & 0xFF) - g) & 0xFF) << 16) |
                    ((((p & 0xFF) - g)) & 0xFF)
                }
                Webp.Vp8lEncoder.encode(w, h, res.map(Lit(_)), subtractGreen = true)
              case 2 => Webp.Vp8lEncoder.encode(w, h, pixels.map(Lit(_)), cacheBits = 4)
              case _ => // last row := row above, via a 2D plane-code backref
                val toks = pixels.take(w * (h - 1)).map(Lit(_)) :+ Ref(w, w)
                Webp.Vp8lEncoder.encode(w, h, toks)
            }
            val img = Webp.WebpDecoder.decodePixels(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var (sr, sg, sb) = (0L, 0L, 0L)
            (0 until img.width * img.height).foreach { i =>
              sr += img.rgb(i * 3) & 0xFF
              sg += img.rgb(i * 3 + 1) & 0xFF
              sb += img.rgb(i * 3 + 2) & 0xFF
            }
            (id, (id % 4), img.width.toLong * img.height, sr, sg, sb)
          }
        }
        .toDF("media_id", "enc_path", "n_px", "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    }),

    // ---- mm32: LOSSY-WebP / VP8X METADATA WALK (round-15 verdict #1)
    // — most real web-corpus `.webp` is lossy VP8, which the pixel
    // decoder refuses by name (DCT + loop-filter reconstruction is
    // native-codec domain). The Mp3/Mp4/Avi precedent applies: the
    // corpus-scale workload is the METADATA pass, and the lossy
    // key-frame header is fully public (RFC 6386 §9.1), as are the
    // VP8X/ANIM/ANMF extended-container chunks. Four container shapes
    // interleave across documents — a REAL VP8L lossless still, a lossy
    // VP8 still (header real, DCT filler), an animated VP8X+ANIM file
    // (canvas dims from VP8X, frame count from the ANMF walk), and a
    // VP8X-wrapped lossless still with the alpha flag — all routed
    // through the one signature-sniffing dispatch. The refusal contract
    // is gated IN THE SAME ROW: pixel decode still succeeds exactly on
    // the lossless shapes and still throws on lossy/animated ones.
    "mm32_webp_metadata" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          import graft.ops.{Multimodal, Webp}
          import graft.ops.Webp.Vp8lEncoder.Lit
          def lossless(id: Long): Array[Byte] = {
            val w = 8 + (id % 5).toInt
            val h = 6 + (id % 3).toInt
            val px = 0xFF000000 | (((id * 7) % 256).toInt << 16) |
              (((id * 3) % 256).toInt << 8) | ((id * 11) % 256).toInt
            Webp.Vp8lEncoder.encode(w, h, Seq.fill(w * h)(Lit(px)))
          }
          it.map { id =>
            val kind = (id % 4).toInt
            val bytes = kind match {
              case 0 => lossless(id)
              case 1 => Webp.WebpFixture.lossyStill(
                16 + (id % 7).toInt * 3, 12 + (id % 5).toInt * 2,
                fillerLen = 24 + (id % 11).toInt, seed = id)
              case 2 => Webp.WebpFixture.animated(
                32 + (id % 9).toInt, 24 + (id % 6).toInt,
                frameDims = Seq.fill((2 + id % 3).toInt)((8, 6)), seed = id)
              case _ =>
                val inner = lossless(id)
                Webp.WebpFixture.extendedFrom(inner,
                  8 + (id % 5).toInt, 6 + (id % 3).toInt, alpha = true)
            }
            val item = Multimodal.MediaItem(id, bytes)
            val m = Multimodal.SniffMetaDecoder.decode(item)
            val pixelsRefused =
              try { Multimodal.SniffPixelDecoder.decodePixels(item); false }
              catch { case _: IllegalArgumentException => true }
            (id, kind.toLong, m.width.toLong, m.height.toLong,
              m.frameCount.toLong, pixelsRefused)
          }
        }
        .toDF("media_id", "kind", "width", "height", "frame_count",
          "pixels_refused")
        .orderBy("media_id")
    }),

    // ---- mm33: EXIF INSIDE WebP — the provenance/orientation pass for
    // the extended container (the VP8X EXIF chunk carries a raw TIFF
    // stream, unlike JPEG's APP1 wrapper). A real VP8L still rides
    // under VP8X with the EXIF flag + chunk; the one metadata walk
    // surfaces dims AND the parsed EXIF, and the orientation-normalized
    // dimensions (the resize-pipeline input) are gated per document —
    // both endiannesses exercised, same fixture fields as mm16 so the
    // JPEG/APP1 and WebP/chunk carriers cross-check one TIFF parser.
    "mm33_webp_exif" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          import graft.ops.{Exif, Multimodal, Webp}
          import graft.ops.Webp.Vp8lEncoder.Lit
          it.map { id =>
            val w = 8 + (id % 5).toInt
            val h = 6 + (id % 3).toInt
            val px = 0xFF000000 | (((id * 7) % 256).toInt << 16)
            val inner = Webp.Vp8lEncoder.encode(w, h, Seq.fill(w * h)(Lit(px)))
            val ori = (id % 8 + 1).toInt
            val tiff = Exif.tiffPayload(ori, s"cam${id % 5}",
              f"2024:01:${id % 27 + 1}%02d 03:04:05",
              pixelX = w.toLong, pixelY = h.toLong,
              littleEndian = id % 2 == 0)
            val bytes = Webp.WebpFixture.extendedFrom(inner, w, h,
              alpha = false, exifTiff = Some(tiff))
            val i = Webp.info(Multimodal.MediaItem(id, bytes))
            val m = i.exif.get
            val (nw, nh) = m.normalizedDims(i.width, i.height)
            (id, i.width.toLong, i.height.toLong, m.orientation.toLong,
              m.make.get, nw.toLong, nh.toLong)
          }
        }
        .toDF("media_id", "width", "height", "orientation", "make",
          "norm_w", "norm_h")
        .orderBy("media_id")
    }),

    "mm30_g711_audio" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val tag = if (id % 2 == 0) 7 else 6 // µ-law / A-law
            val data = Array.tabulate(256)(i => ((i.toLong * i + id) % 256).toByte)
            val bytes = graft.ops.G711.encodeWav(tag, 8000, 1, data)
            val dec = graft.ops.G711.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var sum = 0L; var energy = 0L
            dec.samples.foreach { v => sum += v; energy += v.toLong * v }
            (id, tag.toLong, dec.samples.length.toLong, sum, energy)
          }
        }
        .toDF("media_id", "fmt_tag", "n_samples", "sum_samples", "sum_energy")
        .orderBy("media_id")
    }),

    // ---- mm23: REAL LPC DECODE — the general-predictor subframes wild
    // FLAC is overwhelmingly encoded with (r12 refused them; r13 decodes
    // them). Each document's sawtooth encodes with LPC order 1+id%8
    // (quantized smooth-signal taps, shift 5), alternating with FIXED-2
    // frames so LPC and polynomial predictors interleave in one stream,
    // two Rice partitions per frame. FLAC is lossless, so the gate stays
    // exact: decoded count / sum / energy must equal the oracle's
    // closed-form statement of the ORIGINAL signal — one wrong QLP
    // coefficient, shift, or residual anywhere breaks the hash. Decode
    // is partition-local; payloads never shuffle.
    "mm23_flac_lpc" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val s = Array.tabulate(192)(i =>
              (((id * 31 + i * 57 + i.toLong * i * (1 + id % 89)) % 4096) - 2048).toInt)
            val order = 1 + (id % 8).toInt
            val taps = Array(32, -14, 9, -6, 4, -3, 2, -1)
            val coefs = Array.tabulate(order)(j => taps(j) + order - j)
            val bytes = graft.ops.FlacPcm.FlacPcmEncoder.encode(
              s, 8000, blockSize = 64,
              orderFor = _ => 2,
              partitionOrder = 1,
              lpcFor = f => if (f % 2 == 0) Some((coefs, 5)) else None)
            val dec = graft.ops.FlacPcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            var sum = 0L; var energy = 0L
            dec.foreach { v => sum += v; energy += v.toLong * v }
            (id, order.toLong, dec.length.toLong, sum, energy)
          }
        }
        .toDF("media_id", "lpc_order", "n_samples", "sum_samples", "sum_energy")
        .orderBy("media_id")
    }),

    // ---- mm27: REAL IMA-ADPCM DECODE (ops.Adpcm) — the second
    // compressed-audio codec to leave the stub (WAVE format tag 0x11):
    // a 4-bit adaptive quantizer whose decoder is EXACTLY specified
    // integer arithmetic. ADPCM is lossy, so the gate splits by what is
    // closed-form: the sample count, block count, and the ORIGINAL
    // triangle signal's sum restate in DuckDB; the codec contracts —
    // every block's first sample decodes EXACTLY (it travels verbatim
    // in the block header) and the reconstruction MSE stays under 2% of
    // signal power (the adaptive quantizer tracking a bounded-slope
    // signal) — are engine-side invariants asserted as literal flags.
    // Decode is partition-local; payloads never shuffle.
    "mm27_adpcm_pcm" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 381
            val blockSamples = 127
            val st = 40 + (id % 5).toInt * 8
            val s = Array.tabulate(n)(i =>
              (math.abs((i * st) % 4000 - 2000) - 1000).toShort)
            val bytes = graft.ops.Adpcm.encodeWav(s, 8000, blockSamples)
            val dec = graft.ops.Adpcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            val headersExact = (0 until n by blockSamples)
              .forall(k => dec.samples(k) == s(k))
            var se = 0.0; var power = 0.0; var sumOrig = 0L
            var i = 0
            while (i < n) {
              val d = (dec.samples(i) - s(i)).toDouble
              se += d * d; power += s(i).toDouble * s(i); sumOrig += s(i)
              i += 1
            }
            (id, dec.samples.length.toLong,
              ((n + blockSamples - 1) / blockSamples).toLong,
              sumOrig, if (headersExact) 1L else 0L,
              if (se <= 0.02 * power) 1L else 0L)
          }
        }
        .toDF("media_id", "n_samples", "n_blocks", "sum_orig",
          "headers_exact", "mse_ok")
        .orderBy("media_id")
    }),

    // ---- mm28: STEREO IMA-ADPCM decode — the common wild form of the
    // codec (one state header per channel, nibble data in 4-byte units
    // alternating channels). Same gate split as mm27: frame count,
    // block count, and both channels' original triangle sums restate in
    // DuckDB; per-channel block-header exactness and the 2%-of-power
    // MSE bound ride as engine-measured flags. Decode partition-local.
    "mm28_adpcm_stereo" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val n = 385
            val blockSamples = 129
            val stL = 40 + (id % 5).toInt * 8
            val stR = 48 + (id % 4).toInt * 8
            def tri(st: Int)(i: Int): Short =
              (math.abs((i * st) % 4000 - 2000) - 1000).toShort
            val l = Array.tabulate(n)(tri(stL))
            val r = Array.tabulate(n)(tri(stR))
            val bytes = graft.ops.Adpcm.encodeWavStereo(l, r, 8000, blockSamples)
            val dec = graft.ops.Adpcm.decode(
              graft.ops.Multimodal.MediaItem(id, bytes))
            val frames = dec.samples.length / 2
            val headersExact = (0 until n by blockSamples).forall(k =>
              dec.samples(k * 2) == l(k) && dec.samples(k * 2 + 1) == r(k))
            var seL = 0.0; var seR = 0.0; var pw = 0.0
            var sumL = 0L; var sumR = 0L
            var i = 0
            while (i < n) {
              val dl = (dec.samples(i * 2) - l(i)).toDouble
              val dr = (dec.samples(i * 2 + 1) - r(i)).toDouble
              seL += dl * dl; seR += dr * dr
              pw += l(i).toDouble * l(i) + r(i).toDouble * r(i)
              sumL += l(i); sumR += r(i)
              i += 1
            }
            (id, frames.toLong, ((n + blockSamples - 1) / blockSamples).toLong,
              sumL, sumR, if (headersExact) 1L else 0L,
              if (seL + seR <= 0.02 * pw) 1L else 0L)
          }
        }
        .toDF("media_id", "n_frames", "n_blocks", "sum_l", "sum_r",
          "headers_exact", "mse_ok")
        .orderBy("media_id")
    }),

    "mm18_audio_neardups" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.flatMap { id =>
            def wav(v: Int): Array[Byte] = {
              val n = 128
              val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
                .put("WAVE".getBytes("US-ASCII"))
                .put("fmt ".getBytes("US-ASCII")).putInt(16)
                .putShort(1).putShort(1).putInt(8000).putInt(16000)
                .putShort(2).putShort(16)
                .put("data".getBytes("US-ASCII")).putInt(n * 2)
              var i = 0
              while (i < n) {
                val bump = if (v == 1 && i == (id % 128).toInt) 1000L else 0L
                bb.putShort((((id * 31 + i * 57 + i.toLong * i * (1 + id % 89)
                  + bump) % 4096) - 2048).toShort)
                i += 1
              }
              bb.array()
            }
            Seq((id * 2, wav(0)), (id * 2 + 1, wav(1)))
          }
        }
        .toDF("media_id", "payload")
      val h = graft.ops.Multimodal.audioFingerprint(payloads, "media_id", "payload")
        .toDF()
        .select(col("mediaId").as("media_id"), col("fpHi").as("hi"), col("fpLo").as("lo"))
        .localCheckpoint(true) // ONE decode pass feeds bands + verify
      val bands = h.select(col("media_id"),
          explode(expr("array(" +
            "struct(0 as band, hi & 65535 as bval), " +
            "struct(1 as band, shiftright(hi, 16) & 65535 as bval), " +
            "struct(2 as band, lo & 65535 as bval), " +
            "struct(3 as band, shiftright(lo, 16) & 65535 as bval))")).as("b"))
        .select(col("media_id"), col("b.band").as("band"), col("b.bval").as("bval"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
        .distinct()
      cand
        .join(h.select(col("media_id").as("a_id"),
          col("hi").as("a_hi"), col("lo").as("a_lo")), "a_id")
        .join(h.select(col("media_id").as("b_id"),
          col("hi").as("b_hi"), col("lo").as("b_lo")), "b_id")
        .withColumn("hamming",
          expr("bit_count(a_hi ^ b_hi) + bit_count(a_lo ^ b_lo)").cast("bigint"))
        .filter(col("hamming") <= 3)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy("a_id", "b_id")
    }),

    // ---- mm17: image NEAR-dup at scale — banded hamming join over the
    // perceptual dHash. mm05 catches EXACT dHash equality; real corpora
    // need distance <= k (a re-encode or slight retouch flips a few
    // gradient bits). All-pairs hamming is O(n^2); splitting the 64
    // bits into FOUR 16-bit bands turns candidates into an EQUI-join on
    // (band, value): any pair within hamming 3 shares a band
    // (pigeonhole), so the <= 3 gate has NO false negatives and the
    // candidate set is collision-sized — at 100 TB the 16-bit band
    // keyspace keeps per-bucket counts tiny where 8-bit bands would
    // degenerate toward all-pairs. Fixture: each document contributes
    // its mm05 gradient image (media 2*id) and a one-pixel-perturbed
    // twin (media 2*id + 1) whose dHash differs by <= 2 bits.
    "mm17_hamming_neardups" -> ((spark: SparkSession, dir: String) => {
      import spark.implicits._
      val header = "P6\n9 8\n255\n"
      val payloads = t(spark, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          val head = header.getBytes("US-ASCII")
          it.flatMap { id =>
            // p^2 cross-term: the GRADIENT varies with p and id, so the
            // hash population spreads over ~25k patterns instead of the
            // mm05 linear ramp's ~256 — with a skewed population the
            // band buckets would degenerate toward all-pairs at scale
            def lum(p: Long): Long = (id * 7 + p * 13 + p * p * (1 + id % 97)) % 256
            val base = Array.tabulate(216)(i => lum(i / 3).toByte)
            val pp = (id % 72).toInt
            val tw = base.clone()
            val v2 = ((lum(pp) + 128) % 256).toByte
            tw(pp * 3) = v2; tw(pp * 3 + 1) = v2; tw(pp * 3 + 2) = v2
            Seq((id * 2, head ++ base), (id * 2 + 1, head ++ tw))
          }
        }
        .toDF("media_id", "payload")
      val h = graft.ops.Multimodal.dhash64(payloads, "media_id", "payload",
          graft.ops.Multimodal.PpmDecoder).toDF()
        .select(col("mediaId").as("media_id"),
          col("dhashHi").as("hi"), col("dhashLo").as("lo"))
        .localCheckpoint(true) // ONE decode pass feeds bands + verify
      val bands = h.select(col("media_id"),
          explode(expr("array(" +
            "struct(0 as band, hi & 65535 as bval), " +
            "struct(1 as band, shiftright(hi, 16) & 65535 as bval), " +
            "struct(2 as band, lo & 65535 as bval), " +
            "struct(3 as band, shiftright(lo, 16) & 65535 as bval))")).as("b"))
        .select(col("media_id"), col("b.band").as("band"), col("b.bval").as("bval"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
            col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
        .distinct()
      cand
        .join(h.select(col("media_id").as("a_id"),
          col("hi").as("a_hi"), col("lo").as("a_lo")), "a_id")
        .join(h.select(col("media_id").as("b_id"),
          col("hi").as("b_hi"), col("lo").as("b_lo")), "b_id")
        .withColumn("hamming",
          expr("bit_count(a_hi ^ b_hi) + bit_count(a_lo ^ b_lo)").cast("bigint"))
        .filter(col("hamming") <= 3)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .orderBy("a_id", "b_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // All four feature families in closed form from the fixture's pixel
    // formula v(id, p) = (id*7 + p*13) % 256 on the 9x8 gray grid:
    // mean over p = 0..71; thumbnail (2x1 floor mapping) samples
    // p = 0 and p = 4; dHash bits as in mm05.
    "c03_media_pipeline" ->
      """WITH px AS (
        |  SELECT doc_id, j, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 72)) AS u(j)),
        |m AS (
        |  SELECT doc_id,
        |    CAST(SUM(v) AS DOUBLE) / 72 AS mean_luma,
        |    CAST(SUM(CASE WHEN j IN (0, 4) THEN v ELSE 0 END) AS DOUBLE) / 2
        |      AS thumb_mean_luma
        |  FROM px GROUP BY doc_id),
        |b AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN (doc_id * 7 + (y * 9 + x + 1) * 13) % 256
        |            > (doc_id * 7 + (y * 9 + x) * 13) % 256
        |         THEN 1 ELSE 0 END AS bit
        |  FROM documents, unnest(range(0, 8)) AS uy(y), unnest(range(0, 8)) AS ux(x)),
        |h AS (
        |  SELECT doc_id,
        |    CAST(SUM(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        |    CAST(SUM(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_lo
        |  FROM b GROUP BY doc_id)
        |SELECT m.doc_id AS media_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |  m.mean_luma, h.dhash_hi, h.dhash_lo, m.thumb_mean_luma,
        |  MIN(m.doc_id) OVER (PARTITION BY h.dhash_hi, h.dhash_lo) AS keeper_id,
        |  m.doc_id = MIN(m.doc_id) OVER (PARTITION BY h.dhash_hi, h.dhash_lo) AS is_kept
        |FROM m JOIN h ON m.doc_id = h.doc_id
        |ORDER BY media_id""".stripMargin,

    // Every gradient bit in closed form from the fixture's pixel
    // formula; two int32-range halves (see Multimodal.dhash64).
    "mm05_perceptual_dupes" ->
      """WITH b AS (
        |  SELECT doc_id, y, x,
        |    CASE WHEN (doc_id * 7 + (y * 9 + x + 1) * 13) % 256
        |            > (doc_id * 7 + (y * 9 + x) * 13) % 256
        |         THEN 1 ELSE 0 END AS bit
        |  FROM documents, unnest(range(0, 8)) AS uy(y), unnest(range(0, 8)) AS ux(x)),
        |h AS (
        |  SELECT doc_id AS media_id,
        |    CAST(SUM(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        |    CAST(SUM(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END) AS BIGINT) AS dhash_lo
        |  FROM b GROUP BY doc_id)
        |SELECT media_id, dhash_hi, dhash_lo,
        |  MIN(media_id) OVER (PARTITION BY dhash_hi, dhash_lo) AS keeper_id,
        |  COUNT(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS n_same,
        |  media_id <> MIN(media_id) OVER (PARTITION BY dhash_hi, dhash_lo) AS is_dup
        |FROM h ORDER BY media_id""".stripMargin,

    // The sawtooth's closed form with the i^2 diversity term and the
    // closed-form replay: quarantined ids zero out; good ids carry the
    // gray-ramp mean (sum of 8 values / 8 — exact in doubles)
    // FLAC is lossless: the decoded stream's count/sum/energy must
    // equal the ORIGINAL signal's closed form, whatever subframe mix
    // the id selected.
    "mm22_flac_pcm" ->
      """WITH sm AS (
        |  SELECT doc_id, ((doc_id * 31 + i * 57 + i * i * (1 + doc_id % 89))
        |    % 4096) - 2048 AS s
        |  FROM documents, unnest(range(0, 128)) AS u(i))
        |SELECT doc_id AS media_id, CAST(128 AS BIGINT) AS n_samples,
        |  CAST(SUM(s) AS BIGINT) AS sum_samples,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_energy
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // the full G.711 expansion restated in SQL: µ-law via the biased
    // segment form on the complemented byte, A-law via the 0x55-toggled
    // segment table; signs per the spec's conventions (µ: bit7 of ~n
    // set => negative; A: bit7 of n^0x55 set => positive)
    // mm31: VP8L is lossless, so the oracle restates the raster's
    // closed form — the backref path (doc_id % 4 = 3) re-reads its
    // last row from the row above, exactly what the encoder emitted
    "mm31_webp_lossless" ->
      """WITH px AS (
        |  SELECT doc_id,
        |    8 + doc_id % 5 AS w, 6 + doc_id % 3 AS h, x.x AS x, y.y AS y
        |  FROM documents,
        |    unnest(range(0, 13)) AS x(x),
        |    unnest(range(0, 9)) AS y(y)
        |  WHERE x.x < 8 + doc_id % 5 AND y.y < 6 + doc_id % 3),
        |eff AS (
        |  SELECT doc_id, w, h, x,
        |    CASE WHEN doc_id % 4 = 3 AND y = h - 1 THEN h - 2 ELSE y END AS y
        |  FROM px)
        |SELECT doc_id AS media_id, CAST(doc_id % 4 AS BIGINT) AS enc_path,
        |  CAST(w * h AS BIGINT) AS n_px,
        |  CAST(SUM((x * 7 + y * 13 + doc_id) % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((x * 3 + y * 5 + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((x * 11 + y * 2 + 3 * doc_id) % 256) AS BIGINT) AS sum_b
        |FROM eff GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin,

    // mm33: dims, orientation, make and the orientation-normalized
    // dims restated in closed form (orientations 5-8 transpose)
    "mm33_webp_exif" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 5 AS BIGINT) AS width,
        |  CAST(6 + doc_id % 3 AS BIGINT) AS height,
        |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
        |  'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 6 + doc_id % 3
        |    ELSE 8 + doc_id % 5 END AS BIGINT) AS norm_w,
        |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 8 + doc_id % 5
        |    ELSE 6 + doc_id % 3 END AS BIGINT) AS norm_h
        |FROM documents ORDER BY media_id""".stripMargin,

    // mm32: every gated fact is a closed form of the fixture params —
    // dims per container shape, ANMF frame count, and the refusal
    // contract (pixels decode only for the lossless shapes)
    "mm32_webp_metadata" ->
      """SELECT doc_id AS media_id, CAST(doc_id % 4 AS BIGINT) AS kind,
        |  CAST(CASE doc_id % 4
        |    WHEN 1 THEN 16 + (doc_id % 7) * 3
        |    WHEN 2 THEN 32 + doc_id % 9
        |    ELSE 8 + doc_id % 5 END AS BIGINT) AS width,
        |  CAST(CASE doc_id % 4
        |    WHEN 1 THEN 12 + (doc_id % 5) * 2
        |    WHEN 2 THEN 24 + doc_id % 6
        |    ELSE 6 + doc_id % 3 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 2 THEN 2 + doc_id % 3 ELSE 1 END
        |    AS BIGINT) AS frame_count,
        |  (doc_id % 4) IN (1, 2) AS pixels_refused
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm30_g711_audio" ->
      """WITH raw AS (
        |  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 7 ELSE 6 END AS tag,
        |    (i * i + doc_id) % 256 AS n
        |  FROM documents, unnest(range(0, 256)) AS u(i)),
        |dec AS (
        |  SELECT doc_id, tag,
        |    CASE WHEN tag = 7 THEN
        |      (CASE WHEN (255 - n) >= 128 THEN -1 ELSE 1 END) *
        |      (((((255 - n) % 16) * 8 + 132) << (((255 - n) // 16) % 8)) - 132)
        |    ELSE
        |      (CASE WHEN xor(n, 85) >= 128 THEN 1 ELSE -1 END) *
        |      (CASE WHEN ((xor(n, 85) // 16) % 8) = 0
        |              THEN (xor(n, 85) % 16) * 16 + 8
        |            WHEN ((xor(n, 85) // 16) % 8) = 1
        |              THEN (xor(n, 85) % 16) * 16 + 264
        |            ELSE ((xor(n, 85) % 16) * 16 + 264)
        |                   << (((xor(n, 85) // 16) % 8) - 1) END)
        |    END AS s
        |  FROM raw)
        |SELECT doc_id AS media_id, CAST(tag AS BIGINT) AS fmt_tag,
        |  CAST(256 AS BIGINT) AS n_samples,
        |  CAST(SUM(s) AS BIGINT) AS sum_samples,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_energy
        |FROM dec GROUP BY doc_id, tag ORDER BY media_id""".stripMargin,

    // the depth-scaled signal restated per id's depth: span = 2^bps
    "mm29_flac_depth_matrix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 5 WHEN 0 THEN 8 WHEN 1 THEN 12 WHEN 2 THEN 16
        |      WHEN 3 THEN 20 ELSE 24 END AS bps
        |  FROM documents),
        |sm AS (
        |  SELECT doc_id, bps,
        |    ((doc_id * 31 + i * 57 + i * i * (1 + doc_id % 89))
        |      % CAST(POWER(2, bps) AS BIGINT))
        |      - CAST(POWER(2, bps) AS BIGINT) / 2 AS s
        |  FROM d, unnest(range(0, 128)) AS u(i))
        |SELECT doc_id AS media_id, CAST(bps AS BIGINT) AS bits_per_sample,
        |  CAST(128 AS BIGINT) AS n_samples,
        |  CAST(SUM(s) AS BIGINT) AS sum_samples,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_energy
        |FROM sm GROUP BY doc_id, bps ORDER BY media_id""".stripMargin,

    // LPC subframes are lossless too: the decoded stream must restate
    // the original sawtooth exactly, whatever predictor encoded it.
    "mm23_flac_lpc" ->
      """WITH sm AS (
        |  SELECT doc_id, ((doc_id * 31 + i * 57 + i * i * (1 + doc_id % 89))
        |    % 4096) - 2048 AS s
        |  FROM documents, unnest(range(0, 192)) AS u(i))
        |SELECT doc_id AS media_id, CAST(1 + doc_id % 8 AS BIGINT) AS lpc_order,
        |  CAST(192 AS BIGINT) AS n_samples,
        |  CAST(SUM(s) AS BIGINT) AS sum_samples,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_energy
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // ADPCM is lossy, so only the closed-form columns restate: the
    // count/geometry and the ORIGINAL triangle signal's sum; the codec
    // fidelity contracts are engine-side literals.
    "mm27_adpcm_pcm" ->
      """WITH sm AS (
        |  SELECT doc_id, abs((i * (40 + (doc_id % 5) * 8)) % 4000 - 2000)
        |    - 1000 AS s
        |  FROM documents, unnest(range(0, 381)) AS u(i))
        |SELECT doc_id AS media_id, CAST(381 AS BIGINT) AS n_samples,
        |  CAST(3 AS BIGINT) AS n_blocks,
        |  CAST(SUM(s) AS BIGINT) AS sum_orig,
        |  CAST(1 AS BIGINT) AS headers_exact,
        |  CAST(1 AS BIGINT) AS mse_ok
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // Stereo ADPCM: frame/block geometry and both channels' original
    // sums are closed-form; the codec fidelity flags are engine-side.
    "mm28_adpcm_stereo" ->
      """WITH sm AS (
        |  SELECT doc_id,
        |    abs((i * (40 + (doc_id % 5) * 8)) % 4000 - 2000) - 1000 AS l,
        |    abs((i * (48 + (doc_id % 4) * 8)) % 4000 - 2000) - 1000 AS r
        |  FROM documents, unnest(range(0, 385)) AS u(i))
        |SELECT doc_id AS media_id, CAST(385 AS BIGINT) AS n_frames,
        |  CAST(3 AS BIGINT) AS n_blocks,
        |  CAST(SUM(l) AS BIGINT) AS sum_l,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(1 AS BIGINT) AS headers_exact,
        |  CAST(1 AS BIGINT) AS mse_ok
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // stereo is lossless through every channel assignment: per-channel
    // sums and the combined energy restate the original L/R signals.
    "mm26_flac_stereo" ->
      """WITH sm AS (
        |  SELECT doc_id,
        |    ((doc_id * 31 + i * 57 + i * i * (1 + doc_id % 89)) % 4096) - 2048 AS l,
        |    ((doc_id * 37 + i * 41 + i * i * (2 + doc_id % 83)) % 4096) - 2048 AS r
        |  FROM documents, unnest(range(0, 192)) AS u(i))
        |SELECT doc_id AS media_id, CAST(384 AS BIGINT) AS n_samples,
        |  CAST(SUM(l) AS BIGINT) AS sum_left,
        |  CAST(SUM(r) AS BIGINT) AS sum_right,
        |  CAST(SUM(l * l + r * r) AS BIGINT) AS sum_energy
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // six pixel containers, one closed-form gray; the two failure arms
    // (below-header truncation, unknown signature) are ok=false zeros.
    "mm24_pixel_family_quarantine" ->
      """SELECT doc_id AS media_id,
        |  (doc_id % 4) NOT IN (1, 2) AS ok,
        |  CASE WHEN (doc_id % 4) IN (1, 2) THEN 0
        |       WHEN doc_id % 6 = 3 THEN 16 ELSE 4 END AS width,
        |  CASE WHEN (doc_id % 4) IN (1, 2) THEN 0.0
        |       ELSE CAST(2 * ((doc_id * 7) % 128) AS DOUBLE) END AS mean_luma
        |FROM documents ORDER BY media_id""".stripMargin,

    // four container-metadata formats, typed fields in closed form;
    // truncated and unknown blobs land as ok=false zero rows through
    // the STRICT sniffer (no stub fallback).
    "mm25_media_meta_quarantine" ->
      """SELECT doc_id AS media_id,
        |  doc_id % 3 = 0 AS ok,
        |  CAST(CASE WHEN doc_id % 3 <> 0 THEN 0
        |       WHEN doc_id % 4 = 0 THEN 320
        |       WHEN doc_id % 4 IN (1, 2) THEN 441
        |       ELSE 16 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 <> 0 THEN 0
        |       WHEN doc_id % 4 = 0 THEN 240
        |       WHEN doc_id % 4 = 1 THEN 128
        |       WHEN doc_id % 4 = 2 THEN 1
        |       ELSE 16 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 <> 0 THEN 0
        |       WHEN doc_id % 4 = 0 THEN doc_id % 250 + 1
        |       WHEN doc_id % 4 = 1 THEN doc_id % 120 + 10
        |       WHEN doc_id % 4 = 2 THEN (((doc_id * 100 + 1000) * 1000) // 44100) // 1000
        |       ELSE 2 END AS INT) AS frame_count
        |FROM documents ORDER BY media_id""".stripMargin,

    // MJPEG/AVI: every container field and frame 0's byte-exact DCT
    // round-trip luma stated in closed form.
    "mm21_mjpeg_video" ->
      """SELECT doc_id AS media_id, CAST(3 AS BIGINT) AS frame_count,
        |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  'MJPG' AS codec, CAST(120000 AS BIGINT) AS duration_us,
        |  CAST(2 * ((doc_id * 7) % 128) AS DOUBLE) AS frame0_luma
        |FROM documents ORDER BY media_id""".stripMargin,

    // same gray raster whatever the container: PPM/BMP/PNG holders all
    // decode to one closed-form luma; unknown signatures (id%4=3) and
    // the below-header truncation (id%8=1) are quarantined zero-rows.
    "mm20_mixed_format_quarantine" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 8)) AS u(j)),
        |m AS (SELECT doc_id, AVG(CAST(v AS DOUBLE)) AS mean_luma
        |      FROM px GROUP BY doc_id)
        |SELECT doc_id AS media_id,
        |  (doc_id % 4 <> 3 AND doc_id % 8 <> 1) AS ok,
        |  CASE WHEN doc_id % 4 <> 3 AND doc_id % 8 <> 1 THEN 4 ELSE 0 END AS width,
        |  CASE WHEN doc_id % 4 <> 3 AND doc_id % 8 <> 1 THEN mean_luma ELSE 0.0 END
        |    AS mean_luma
        |FROM m ORDER BY media_id""".stripMargin,

    "mm19_decode_quarantine" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 8)) AS u(j)),
        |m AS (SELECT doc_id, AVG(CAST(v AS DOUBLE)) AS mean_luma
        |      FROM px GROUP BY doc_id)
        |SELECT doc_id AS media_id,
        |  doc_id % 7 <> 3 AS ok,
        |  CASE WHEN doc_id % 7 <> 3 THEN 4 ELSE 0 END AS width,
        |  CASE WHEN doc_id % 7 <> 3 THEN mean_luma ELSE 0.0 END AS mean_luma
        |FROM m ORDER BY media_id""".stripMargin,

    // one-sample bump; window energies, gradient bits, banding, and the
    // hamming verify restated exactly.
    "mm18_audio_neardups" ->
      """WITH sm AS (
        |  SELECT doc_id, v, i,
        |    ((doc_id * 31 + i * 57 + i * i * (1 + doc_id % 89)
        |      + CASE WHEN v = 1 AND i = doc_id % 128 THEN 1000 ELSE 0 END)
        |     % 4096) - 2048 AS s
        |  FROM documents, unnest(range(0, 2)) AS uv(v), unnest(range(0, 128)) AS ui(i)),
        |en AS (
        |  SELECT doc_id, v, i // 2 AS w, SUM(s * s) AS e
        |  FROM sm GROUP BY doc_id, v, i // 2),
        |b AS (
        |  SELECT l.doc_id, l.v, l.w AS b,
        |    CASE WHEN r.e > l.e THEN 1 ELSE 0 END AS bit
        |  FROM en l JOIN en r ON r.doc_id = l.doc_id AND r.v = l.v AND r.w = l.w + 1
        |  WHERE l.w < 63),
        |h AS (
        |  SELECT doc_id * 2 + v AS media_id,
        |    CAST(SUM(CASE WHEN b < 32 THEN bit * (1::BIGINT << b) ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (b - 32)) ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id, v),
        |bands AS (
        |  SELECT media_id, band,
        |    CASE band WHEN 0 THEN hi & 65535 WHEN 1 THEN (hi >> 16) & 65535
        |              WHEN 2 THEN lo & 65535 ELSE (lo >> 16) & 65535 END AS bval
        |  FROM h, unnest(range(0, 4)) AS ub(band)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS a_id, b2.media_id AS b_id
        |  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bval = b2.bval
        |    AND a.media_id < b2.media_id)
        |SELECT c.a_id, c.b_id,
        |  CAST(bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) AS BIGINT)
        |    AS hamming
        |FROM cand c JOIN h ha ON ha.media_id = c.a_id JOIN h hb ON hb.media_id = c.b_id
        |WHERE bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // Same closed form as mm05, with the perturbed twin (v = 1) flipping
    // one grid cell by +128 mod 256; banding and the hamming verify are
    // restated in SQL exactly (4 x 16-bit bands, <= 3 gate).
    "mm17_hamming_neardups" ->
      """WITH px AS (
        |  SELECT doc_id, v, p,
        |    CASE WHEN v = 1 AND p = doc_id % 72
        |         THEN ((doc_id * 7 + p * 13 + p * p * (1 + doc_id % 97)) % 256 + 128) % 256
        |         ELSE (doc_id * 7 + p * 13 + p * p * (1 + doc_id % 97)) % 256 END AS luma
        |  FROM documents, unnest(range(0, 2)) AS uv(v), unnest(range(0, 72)) AS up(p)),
        |b AS (
        |  SELECT l.doc_id, l.v, (l.p // 9) AS y, (l.p % 9) AS x,
        |    CASE WHEN r.luma > l.luma THEN 1 ELSE 0 END AS bit
        |  FROM px l JOIN px r ON r.doc_id = l.doc_id AND r.v = l.v AND r.p = l.p + 1
        |  WHERE l.p % 9 < 8),
        |h AS (
        |  SELECT doc_id * 2 + v AS media_id,
        |    CAST(SUM(CASE WHEN y < 4 THEN bit * (1::BIGINT << (y * 8 + x)) ELSE 0 END)
        |      AS BIGINT) AS hi,
        |    CAST(SUM(CASE WHEN y >= 4 THEN bit * (1::BIGINT << ((y - 4) * 8 + x)) ELSE 0 END)
        |      AS BIGINT) AS lo
        |  FROM b GROUP BY doc_id, v),
        |bands AS (
        |  SELECT media_id, band,
        |    CASE band WHEN 0 THEN hi & 65535 WHEN 1 THEN (hi >> 16) & 65535
        |              WHEN 2 THEN lo & 65535 ELSE (lo >> 16) & 65535 END AS bval
        |  FROM h, unnest(range(0, 4)) AS ub(band)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS a_id, b2.media_id AS b_id
        |  FROM bands a JOIN bands b2 ON a.band = b2.band AND a.bval = b2.bval
        |    AND a.media_id < b2.media_id)
        |SELECT c.a_id, c.b_id,
        |  CAST(bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) AS BIGINT)
        |    AS hamming
        |FROM cand c JOIN h ha ON ha.media_id = c.a_id JOIN h hb ON hb.media_id = c.b_id
        |WHERE bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo)) <= 3
        |ORDER BY a_id, b_id""".stripMargin,

    // The sawtooth's closed form: v(id, i) = ((id*31 + i*57) % 4096) -
    // 2048 over i = 0..63 at 8 kHz mono; duration = 64*1000/8000 = 8 ms.
    "mm06_wav_stats" ->
      """WITH s AS (
        |  SELECT doc_id, ((doc_id * 31 + i * 57) % 4096) - 2048 AS v
        |  FROM documents, unnest(range(0, 64)) AS u(i))
        |SELECT doc_id AS media_id,
        |  CAST(8000 AS INT) AS sample_rate,
        |  CAST(64 AS BIGINT) AS n_frames,
        |  CAST(8 AS BIGINT) AS duration_ms,
        |  CAST(MAX(abs(v)) AS INT) AS peak,
        |  CAST(SUM(v * v) AS DOUBLE) / 64 AS mean_square,
        |  CAST(SUM(CASE WHEN abs(v) >= 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // Same 72-pixel closed form as mm05/c03 — a gray pixel's Rec.601
    // luma is its value, so the PNG round-trip must reproduce the
    // formula exactly for the hashes to match.
    "mm12_mixed_corpus_stats" ->
      """WITH ramp AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 72)) AS u(j)
        |  WHERE doc_id % 5 < 4),
        |rs AS (
        |  SELECT doc_id AS media_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |    CAST(SUM(v) AS DOUBLE) / 72 AS mean_luma,
        |    CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |  FROM ramp GROUP BY doc_id),
        |js AS (
        |  SELECT doc_id AS media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |    CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS DOUBLE) AS mean_luma,
        |    CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS INT) AS min_luma,
        |    CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS INT) AS max_luma
        |  FROM documents WHERE doc_id % 5 = 4)
        |SELECT * FROM rs UNION ALL SELECT * FROM js ORDER BY media_id""".stripMargin,

    "mm11_mp3_metadata" ->
      """SELECT doc_id AS media_id, 'MPEG1' AS mpeg_version,
        |  CAST(44100 AS INT) AS sample_rate, CAST(128 AS INT) AS bitrate_kbps,
        |  FALSE AS vbr,
        |  CAST(doc_id % 120 + 10 AS BIGINT) AS n_frames,
        |  CAST(((doc_id % 120 + 10) * 1152 * 1000) // 44100 AS BIGINT) AS duration_ms,
        |  'doc ' || CAST(doc_id AS VARCHAR) AS title,
        |  'src ' || CAST(doc_id % 7 AS VARCHAR) AS artist
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm13_flac_metadata" ->
      """SELECT doc_id AS media_id, CAST(44100 AS INT) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST(doc_id * 100 + 1000 AS BIGINT) AS total_samples,
        |  CAST(((doc_id * 100 + 1000) * 1000) // 44100 AS BIGINT) AS duration_ms,
        |  'doc ' || CAST(doc_id AS VARCHAR) AS title,
        |  'src ' || CAST(doc_id % 7 AS VARCHAR) AS artist
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm14_tiff_pixel_stats" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 72)) AS u(j))
        |SELECT doc_id AS media_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(SUM(v) AS DOUBLE) / 72 AS mean_luma,
        |  CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "mm10_gif_pixel_stats" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 72)) AS u(j))
        |SELECT doc_id AS media_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(SUM(v) AS DOUBLE) / 72 AS mean_luma,
        |  CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "mm16_exif_metadata" ->
      """SELECT doc_id AS media_id,
        |  CAST(doc_id % 8 + 1 AS INT) AS orientation,
        |  'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  '2024:01:' || lpad(CAST(doc_id % 27 + 1 AS VARCHAR), 2, '0')
        |    || ' 03:04:05' AS date_time,
        |  CAST(24 + doc_id % 7 AS BIGINT) AS pixel_x,
        |  CAST(16 AS BIGINT) AS pixel_y,
        |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 16 ELSE 24 END AS INT) AS norm_w,
        |  CAST(CASE WHEN doc_id % 8 + 1 >= 5 THEN 24 ELSE 16 END AS INT) AS norm_h
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm09_mp4_metadata" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
        |  CAST(1000 AS BIGINT) AS timescale,
        |  CAST((doc_id % 3600) * 100 + 500 AS BIGINT) AS duration_ms,
        |  CAST(2 AS INT) AS n_tracks, 'avc1' AS video_codec,
        |  CAST(320 + (doc_id % 4) * 160 AS INT) AS width,
        |  CAST(240 + (doc_id % 4) * 120 AS INT) AS height,
        |  CAST(doc_id % 250 + 1 AS BIGINT) AS n_frames,
        |  'mp4a' AS audio_codec,
        |  CAST((doc_id % 250 + 1) * 2 AS BIGINT) AS n_audio_samples
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm15_progressive_jpeg_stats" ->
      """SELECT doc_id AS media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(128 + 2 * ((doc_id * 11) % 53 - 26) AS DOUBLE) AS mean_luma,
        |  CAST(128 + 2 * ((doc_id * 11) % 53 - 26) AS INT) AS min_luma,
        |  CAST(128 + 2 * ((doc_id * 11) % 53 - 26) AS INT) AS max_luma
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm08_jpeg_pixel_stats" ->
      """SELECT doc_id AS media_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS DOUBLE) AS mean_luma,
        |  CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS INT) AS min_luma,
        |  CAST(128 + 2 * ((doc_id * 7) % 57 - 28) AS INT) AS max_luma
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm07_png_pixel_stats" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 72)) AS u(j))
        |SELECT doc_id AS media_id, CAST(9 AS INT) AS width, CAST(8 AS INT) AS height,
        |  CAST(SUM(v) AS DOUBLE) / 72 AS mean_luma,
        |  CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "mm04_thumbnail_stats" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest([0, 2]) AS u(j))
        |SELECT doc_id AS media_id, CAST(4 AS INT) AS src_w, CAST(2 AS INT) AS src_h,
        |  CAST(SUM(v) AS DOUBLE) / 2 AS mean_luma,
        |  CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,
    "mm03_ppm_pixel_stats" ->
      """WITH px AS (
        |  SELECT doc_id, (doc_id * 7 + j * 13) % 256 AS v
        |  FROM documents, unnest(range(0, 8)) AS u(j))
        |SELECT doc_id AS media_id, CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
        |  CAST(SUM(v) AS DOUBLE) / 8 AS mean_luma,
        |  CAST(MIN(v) AS INT) AS min_luma, CAST(MAX(v) AS INT) AS max_luma
        |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin,

    "mm01_media_metadata" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text)) AS byte_len,
        |  md5(text) AS content_hash,
        |  octet_length(encode(text)) % 640 AS width,
        |  octet_length(encode(text)) * 7 % 480 AS height,
        |  octet_length(encode(text)) % 30 + 1 AS frame_count
        |FROM documents ORDER BY media_id""".stripMargin,

    "mm02_frame_sample" ->
      """WITH meta AS (
        |  SELECT doc_id AS media_id, md5(text) AS content_hash,
        |    octet_length(encode(text)) % 30 + 1 AS frame_count
        |  FROM documents)
        |SELECT media_id, frame_count, frame_idx,
        |  md5(content_hash || ':' || frame_idx) AS frame_fp
        |FROM meta, unnest(range(0, frame_count, 5)) AS u(frame_idx)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
