package graft.queries

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}

/** Behavior + plan contracts for the curation operators (CurationQueries).
  * The DuckDB oracle pins exact values; these tests pin the *invariants*
  * that make the operators safe to run on a 100 TB corpus: redaction
  * completeness, partition-invariant splits, packing bounds, quantizer
  * error bounds, and the broadcast shape of the contamination join. */
class CurationSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("bigram queries survive single-word and empty documents (review regression)") {
    import spark.implicits._
    // sequence(1, size-1) DESCENDS for size=1 and element_at(_, 0)
    // throws; the shared zip_with builder must yield zero bigrams
    // instead, matching the oracle's empty range(1, 1).
    val tmp = java.nio.file.Files.createTempDirectory("one_word")
    Seq(
      (1L, "solo", "en", "src0", 4L),
      (2L, "", "en", "src0", 0L),
      (3L, "two words here", "en", "src1", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp.resolve("documents.parquet").toString)
    val qf03 = SparkEntry.queries("qf03_bigram_surprisal")(spark, tmp.toString)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qf03 == Map(3L -> 2L), s"only the multi-word doc has bigrams: $qf03")
    val t06 = SparkEntry.queries("t06_top_bigrams")(spark, tmp.toString).collect()
    assert(t06.length == 2 && t06.forall(_.getLong(3) == 1L), // (lang, rk, bigram, n)
      s"expected the 2 bigrams of doc 3 once each: ${t06.mkString(";")}")
    val qf01 = SparkEntry.queries("qf01_repetition_filter")(spark, tmp.toString)
      .collect().map(_.getLong(0)).toSet
    assert(qf01 == Set(3L), "docs with no bigrams drop out of the bigram-stats join")
  }

  test("pii01: every injected contact is counted and fully redacted") {
    val rows = q("pii01_redact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (e, p, ip) = (r.getInt(1), r.getInt(2), r.getInt(3))
      id % 4 match {
        case 0 => assert((e, p, ip) == (1, 0, 0), s"doc $id")
        case 1 => assert((e, p, ip) == (0, 1, 0), s"doc $id")
        case 2 => assert((e, p, ip) == (0, 0, 1), s"doc $id")
        case _ => assert((e, p, ip) == (0, 0, 0), s"doc $id")
      }
      val red = r.getString(4)
      assert(!red.matches(".*[0-9]{3}-[0-9]{4}.*") && !red.contains("@"),
        s"doc $id still contains PII: $red")
      assert((id % 4 == 3) == !red.contains("[PII]"), s"doc $id redaction marker")
    }
  }

  test("split01: assignment is partition-invariant and covers every doc once") {
    val once = q("split01_hash_split").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // identical assignment after an adversarial repartition (content-hash
    // splits must not depend on physical layout)
    val bucketExpr =
      "cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 100"
    val viaShuffled = Tables.t(spark, sf0001, "documents").repartition(7)
      .withColumn("bucket", expr(bucketExpr))
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(once == viaShuffled)
    val sizes = once.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > sizes("val") && sizes("train") > sizes("test"),
      s"80/10/10 shape: $sizes")
  }

  test("pack01: offsets stay inside the 512-token window; bins are monotone per lang") {
    val rows = q("pack01_sequence_packing")
      .select("lang", "doc_id", "n_tokens", "bin", "bin_offset").collect()
    rows.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < 512, s"offset out of window: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byDoc = rs.sortBy(_.getLong(1))
      val bins = byDoc.map(_.getLong(3))
      assert(bins.zip(bins.tail).forall { case (a, b) => a <= b }, s"$lang bins not monotone")
      // conservation: last bin == floor(preceding-token-count / 512)
      val total = byDoc.map(_.getInt(2).toLong).sum
      val last = byDoc.last
      assert(last.getLong(3) == (total - last.getInt(2)) / 512, s"$lang bin conservation")
    }
  }

  test("cont01: benchmark gram set broadcasts; corpus side never cartesians") {
    val p = q("cont01_contamination").queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), "benchmark grams must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("quant01: reconstruction error is bounded by one quantization step") {
    val rows = q("quant01_int8_embeddings").select("scale", "mse").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, mse) = (r.getDouble(0), r.getDouble(1))
      // floor-quantization error per element lies in [0, scale), so the
      // mean square is strictly below scale^2
      assert(mse >= 0.0 && mse < scale * scale, s"scale=$scale mse=$mse")
    }
  }

  test("samp02: kept set is a deterministic subset honoring per-source rates") {
    val docs = Tables.t(spark, sf0001, "documents")
    val kept = q("samp02_weighted_mix").collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(docs.select("doc_id").collect().map(_.getLong(0)).toSet))
    // full-rate sources (srcN with N % 4 == 0) keep every doc
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBySource = kept.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    bySource.keys.filter(s => s.drop(3).toInt % 4 == 0).foreach { s =>
      assert(keptBySource.getOrElse(s, 0) == bySource(s), s"source $s must keep all docs")
    }
    // re-run returns the identical set (reproducible sampling)
    val again = q("samp02_weighted_mix").collect().map(_.getLong(0)).toSet
    assert(again == keptIds)
  }

  test("qf01: fractions are true ratios and the flag matches its definition") {
    q("qf01_repetition_filter").collect().foreach { r =>
      val top = r.getDouble(3); val dup = r.getDouble(4)
      assert(top > 0.0 && top <= 1.0 && dup >= 0.0 && dup < 1.0)
      assert(r.getBoolean(5) == (top >= 0.07 || dup >= 0.65))
    }
  }

  test("qf05: trained classifier beats the majority predictor; weights shared") {
    // rows: (label_quality, n_docs, n_pred_quality, n_correct, w0..w3)
    val rows = q("qf05_quality_classifier").collect()
    assert(rows.length == 2 && rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val n = rows.map(_.getLong(1)).sum
    val nCorrect = rows.map(_.getLong(3)).sum
    val majority = rows.map(_.getLong(1)).max
    assert(nCorrect > majority,
      s"training must beat predicting the majority class: $nCorrect vs $majority of $n")
    // both class rows report the SAME trained weight vector, and
    // training actually moved it off the zero init
    val ws = rows.map(r => (4 to 7).map(r.getLong)).distinct
    assert(ws.length == 1 && ws.head.exists(_ != 0L))
    // weights stayed inside the fixed-point clamp
    assert(ws.head.forall(w => math.abs(w) <= 4000000L))
  }
}
