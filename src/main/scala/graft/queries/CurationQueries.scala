package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Training-data curation operators — the pipeline stages a pre-training
  * corpus passes through after dedup (graft.ops.Dedup) and quality stats
  * (graft.ops.TextAnalysis): PII redaction, deterministic dataset splits,
  * weighted source mixing, repetition filters, benchmark-contamination
  * screening, sequence packing, and embedding quantization.
  *
  * Reference scope note: the reference ETL (ingestion_service.rs:45-127)
  * stops at parse->enrich->store; everything here is the beyond-reference
  * surface the builder prompt asks for, designed Spark-first.
  *
  * Scale notes (100 TB):
  *  - pii01/split01/samp02/pack01/chunk01/quant01 are scan-local projections or a
  *    single keyed window — no joins, no driver state; they run at scan
  *    throughput on any number of executors.
  *  - qf01 aggregates (doc, bigram) then doc — two map-side-combinable
  *    shuffles keyed by doc_id, never by a global key.
  *  - cont01 joins the corpus n-gram stream against a DISTINCT benchmark
  *    gram set, broadcast (benchmarks are ~1e4 docs even at corpus scale
  *    of 1e10) — the canonical decontamination inverted-index shape; the
  *    corpus side never shuffles.
  *
  * Determinism: hash buckets are md5-derived (identical across engines,
  * runs, and partitionings — reproducible splits/samples are what make a
  * 100 TB training set auditable); ratios are IEEE double divisions of
  * exact integers; squared errors use explicit multiplication (pow() is
  * libm-dependent); DuckDB window SUMs are CAST to BIGINT (HUGEINT trap).
  */
object CurationQueries {

  private val words = split(col("text"), " ")

  /** The qf04 decile relation as a DuckDB CTE chain ending in `deciles`
    * — shared by the qf04 and samp04 oracles. */
  private val qualityDecilesCte: String =
    """WITH perdoc AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_words,
      |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score
      |  FROM documents),
      |hist AS (
      |  SELECT score, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_words) AS BIGINT) AS sum_words,
      |    CAST(sum(n_uniq) AS BIGINT) AS sum_uniq
      |  FROM perdoc GROUP BY score),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM perdoc),
      |cum AS (
      |  SELECT score, n_docs, sum_words, sum_uniq,
      |    CAST(sum(n_docs) OVER (ORDER BY score
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM hist),
      |deciles AS (
      |  SELECT (10 * cum + n_total - 1) // n_total AS decile,
      |    CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |    CAST(sum(sum_words) AS BIGINT) AS n_tokens,
      |    CAST(sum(sum_uniq) AS DOUBLE) / CAST(sum(sum_words) AS DOUBLE)
      |      AS pooled_unique_ratio,
      |    min(score) AS min_score, max(score) AS max_score
      |  FROM cum, tot GROUP BY 1)""".stripMargin

  /** Shared qf04/samp04 builder: token budget per VALUE-based quality
    * decile (ceil(10 * cume_dist), ties share a bucket), computed from a
    * distinct-score histogram — deliberately NOT a corpus-grain ntile,
    * which would be a single-reducer sort at 100 TB. The running sum
    * windows over the histogram relation only (w02/w06 bounded-
    * cardinality class); decile ids are pure int64 ceil-division
    * (pr01-style div, positive operands); per-decile means are POOLED
    * exact-int sums in one final IEEE division. */
  private def qualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = t(spark, dir, "documents").select(
        col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_uniq"))
      .withColumn("score",
        col("n_uniq").cast("double") / col("n_words").cast("double"))
    val hist = perDoc.groupBy("score").agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("sum_words"),
      sum("n_uniq").as("sum_uniq"))
    val total = perDoc.agg(count(lit(1)).as("n_total"))
    val cum = hist.withColumn("cum",
      sum("n_docs").over(Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(total))
      .withColumn("decile", expr("(10 * cum + n_total - 1) div n_total"))
      .groupBy("decile").agg(
        sum("n_docs").as("n_docs"),
        sum("sum_words").as("n_tokens"),
        (sum("sum_uniq").cast("double") / sum("sum_words").cast("double"))
          .as("pooled_unique_ratio"),
        min("score").as("min_score"),
        max("score").as("max_score"))
  }

  // Java-regex and RE2-compatible PII patterns: plain character classes,
  // no lookaround, no backreferences (the RE2 subset both engines share).
  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+[a-z]"
  private val PhoneRe = "[0-9]{3}-[0-9]{4}"
  private val IpRe = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
  private val AnyPiiRe = s"$EmailRe|$PhoneRe|$IpRe"

  // Shared between the standalone stage queries and the composed c01
  // pipeline — ONE definition each, so a threshold/salt tune can't leave
  // the pipeline silently running a stale copy of a stage.
  // Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446 §A1.1):
  private val GopherMinWords = 25
  private val GopherMaxWords = 5000
  private val GopherMinWlen = 3.0
  private val GopherMaxWlen = 10.0
  private val GopherMinAlpha = 0.9
  private val GopherMinStop = 2
  // Gopher per-doc feature columns (append after selecting doc keys):
  private val gopherCols: Seq[org.apache.spark.sql.Column] = Seq(
    size(words).as("n_words"),
    expr("aggregate(transform(split(text, ' '), x -> cast(length(x) as bigint)), 0L, (a, x) -> a + x)")
      .as("sum_wlen"),
    expr("size(filter(split(text, ' '), x -> x rlike '^[a-z]+$'))").as("n_alpha"),
    (array_contains(words, "the").cast("int") + array_contains(words, "a").cast("int") +
      array_contains(words, "and").cast("int") + array_contains(words, "of").cast("int") +
      array_contains(words, "to").cast("int") + array_contains(words, "in").cast("int"))
      .as("n_stop"))
  // The conjunctive pass decision over those columns:
  private val gopherPass: org.apache.spark.sql.Column =
    col("n_words").between(GopherMinWords, GopherMaxWords) &&
      col("sum_wlen").cast("double") / col("n_words").cast("double") >= GopherMinWlen &&
      col("sum_wlen").cast("double") / col("n_words").cast("double") <= GopherMaxWlen &&
      col("n_alpha").cast("double") / col("n_words").cast("double") >= GopherMinAlpha &&
      col("n_stop") >= GopherMinStop
  // DuckDB mirror of gopherCols (the m-CTE select list):
  private val gopherColsSql =
    """len(string_split(text, ' ')) AS n_words,
      |    list_sum(list_transform(string_split(text, ' '), x -> CAST(length(x) AS BIGINT))) AS sum_wlen,
      |    len(list_filter(string_split(text, ' '), x -> regexp_matches(x, '^[a-z]+$'))) AS n_alpha,
      |    (CAST(list_contains(string_split(text, ' '), 'the') AS INT)
      |     + CAST(list_contains(string_split(text, ' '), 'a') AS INT)
      |     + CAST(list_contains(string_split(text, ' '), 'and') AS INT)
      |     + CAST(list_contains(string_split(text, ' '), 'of') AS INT)
      |     + CAST(list_contains(string_split(text, ' '), 'to') AS INT)
      |     + CAST(list_contains(string_split(text, ' '), 'in') AS INT)) AS n_stop""".stripMargin
  // qf05 fixed-point LR trainer: iteration count and learning-rate
  // multiplier were grid-searched offline on all three SFs (8 iters,
  // lrm 4 -> train accuracy 0.83-0.84 vs 0.60-0.62 majority baseline at
  // every scale; larger rates oscillate, fewer iterations stay at the
  // majority predictor). Weights are int64 at scale 1e6, features int64
  // centered at scale 1e3, so Z = w·x sits at scale 1e9 and
  // u = Z div 4e6 + 500 is the hard-sigmoid pre-activation at scale 1e3
  // — every training step is integer arithmetic both engines compute
  // bit-identically (`div`/`//` both truncate toward zero).
  private val LrIters = 8
  private val LrMult = 4L
  private val LrClamp = 4000000L
  // centered quantized features; x0 = 1000 is the implicit bias input
  private val lrFeatSqlDuck =
    """(1000 * LEAST(n_words, 100)) // 100 - 500 AS x1,
      |    (1000 * n_uniq) // n_words - 500 AS x2,
      |    (1000 * n_stop) // 6 - 500 AS x3""".stripMargin
  private val lrUSqlDuck =
    "((w0 * 1000 + w1 * x1 + w2 * x2 + w3 * x3) // 4000000) + 500"
  private val lrUSqlSpark =
    "((w0 * 1000L + w1 * x1 + w2 * x2 + w3 * x3) div 4000000L) + 500L"

  // md5 split bucket in [0,100): <80 train, <90 val, else test — the one
  // salt both engines and every split consumer must agree on.
  private val splitBucketExpr =
    "cast(conv(substr(md5(concat('split:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 100"
  private val splitBucketSql =
    "('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 100"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- pii01: PII detect + redact. The corpus is synthetic word salad
    // with no digits, so the query first stamps a deterministic contact
    // string per doc (a fixture, like mm01's fake payloads) and then runs
    // the real operator: regexp_count per PII class + one-pass redaction.
    // Pure codegen'd projection, zero shuffle.
    "pii01_redact" -> ((spark: SparkSession, dir: String) => {
      val contact = when(col("doc_id") % 4 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.org")))
        .when(col("doc_id") % 4 === 1,
          concat(lit(" call 555-"), lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")))
        .when(col("doc_id") % 4 === 2,
          concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
        .otherwise(lit(""))
      t(spark, dir, "documents")
        .withColumn("record", concat(col("text"), contact))
        .select(col("doc_id"),
          regexp_count(col("record"), lit(EmailRe)).as("n_email"),
          regexp_count(col("record"), lit(PhoneRe)).as("n_phone"),
          regexp_count(col("record"), lit(IpRe)).as("n_ip"),
          regexp_replace(col("record"), AnyPiiRe, "[PII]").as("redacted"))
        .orderBy("doc_id")
    }),

    // ---- pii02: k-anonymity audit — pii01 handles PII *in content*;
    // this handles PII *by linkage*: before releasing a table with
    // quasi-identifiers (nation, segment, account-balance band), every
    // equivalence class over those columns must hold >= k individuals,
    // or its members are re-identifiable by joining public attributes
    // (Sweeney 2002). Output is the per-class audit a release gate
    // reads: class key, size, and the k>=5 verdict. Scale: ONE
    // map-side-combinable aggregation over the scan — the class count
    // is the only shuffle; banding is scan-local; generalizing a
    // failing attribute (wider bands) just re-runs the same plan.
    "pii02_k_anonymity" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "customer")
        .select(col("c_nationkey").as("nationkey"),
          col("c_mktsegment").as("segment"),
          floor(col("c_acctbal").cast("double") / 2000.0).cast("int").as("bal_band"))
        .groupBy("nationkey", "segment", "bal_band")
        .agg(count(lit(1)).as("class_size"))
        .withColumn("k_anonymous", col("class_size") >= 5)
        .orderBy("nationkey", "segment", "bal_band")
    }),

    // ---- split01: deterministic train/val/test split — md5 bucket in
    // [0,100): <80 train, <90 val, else test. Content-independent and
    // stable under repartitioning/re-runs, so the same doc lands in the
    // same split on every engine at every scale.
    "split01_hash_split" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "documents")
        .withColumn("bucket", expr(splitBucketExpr))
        .withColumn("split",
          when(col("bucket") < 80, lit("train"))
            .when(col("bucket") < 90, lit("val"))
            .otherwise(lit("test")))
        .select(col("doc_id"), col("lang"), col("bucket"), col("split"))
        .orderBy("doc_id")
    }),

    // ---- split02: split sizes by (split, lang) — the sanity report every
    // split job emits. Map-side-combinable groupBy, one shuffle.
    "split02_split_sizes" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "documents")
        .withColumn("bucket", expr(splitBucketExpr))
        .withColumn("split",
          when(col("bucket") < 80, lit("train"))
            .when(col("bucket") < 90, lit("val"))
            .otherwise(lit("test")))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang")
    }),

    // ---- samp02: weighted source mixing — each source keeps a configured
    // fraction of docs (domain-mixture weights, the knob every pre-training
    // recipe tunes), selected by md5 bucket so the sample is reproducible.
    // Integer threshold compare (no float rate math), scan-local.
    "samp02_weighted_mix" -> ((spark: SparkSession, dir: String) => {
      val srcNum = substring(col("source"), 4, 6).cast("int")
      val thr = when(srcNum % 4 === 0, lit(10000)) // keep all
        .when(srcNum % 4 === 1, lit(5000)) //  1/2
        .when(srcNum % 4 === 2, lit(2500)) //  1/4
        .otherwise(lit(1000)) //                1/10
      t(spark, dir, "documents")
        .withColumn("bucket", expr(
          "cast(conv(substr(md5(concat('mix:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 10000"))
        .filter(col("bucket") < thr)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- samp03: DSIR-style importance resampling (Xie et al. 2023,
    // "Data Selection for Language Models via Importance Resampling"):
    // pick the raw-pool documents whose hashed-bigram feature profile
    // looks most like a target domain (here lang='en'). Faithful to the
    // method's shape — hashed n-gram features, target/raw bucket
    // distributions with add-1 smoothing, per-doc importance weight,
    // top-k selection — but the bucket score is the integer-scaled ratio
    // ((n_t+1)*1e6) div (n_r+1) rather than a log-ratio: summed exactly
    // in int64, it is order-independent and engine-identical, where
    // float log sums are neither (libm + fold order). Scale shape: ONE
    // corpus pass computes the bigram->bucket occurrences, which are
    // localCheckpointed so the THREE consumers (target counts, raw
    // counts, weights) reuse the materialization instead of re-running
    // the scan+explode each; the two 64-bucket count relations
    // broadcast back, weight = one map-side aggregation, and top-k is
    // TakeOrdered (per-partition heaps), not a global sort/window.
    "samp03_dsir_importance" -> ((spark: SparkSession, dir: String) => {
      val pairs = t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), explode(expr(
          graft.ops.TextAnalysis.bigramPairsExpr("text"))).as("p"))
        .select(col("doc_id"), col("lang"),
          (expr(graft.ops.Dedup.h32("concat(p.w1, ' ', p.w2)")) % 64).as("bucket"))
        .localCheckpoint(true)
      val tCounts = pairs.filter(col("lang") === "en")
        .groupBy("bucket").agg(count(lit(1)).as("n_t"))
      val rCounts = pairs.filter(col("lang") =!= "en")
        .groupBy("bucket").agg(count(lit(1)).as("n_r"))
      // full 0..63 bucket domain so smoothing defines a score everywhere
      val scores = spark.range(64).select(col("id").as("bucket"))
        .join(tCounts, Seq("bucket"), "left_outer")
        .join(rCounts, Seq("bucket"), "left_outer")
        .select(col("bucket"), expr(
          "((coalesce(n_t, 0L) + 1L) * 1000000L) div (coalesce(n_r, 0L) + 1L)").as("s"))
      val weights = pairs.filter(col("lang") =!= "en")
        .join(broadcast(scores), "bucket")
        .groupBy("doc_id")
        .agg(sum(col("s")).as("weight"), count(lit(1)).as("n_bigrams"))
      val top = weights
        .orderBy(col("weight").desc, col("doc_id").asc)
        .limit(100) // TakeOrdered — the distributed top-k
      top.withColumn("rk", row_number().over( // rank over the 100-row result only
          Window.orderBy(col("weight").desc, col("doc_id").asc)))
        .select(col("rk"), col("doc_id"), col("weight"), col("n_bigrams"))
        .orderBy("rk")
    }),

    // ---- qf01: Gopher-style repetition filters — top-bigram fraction and
    // duplicate-word fraction per doc, with the flag a curation pass would
    // drop on. Two doc_id-keyed aggregations joined doc-to-doc.
    "qf01_repetition_filter" -> ((spark: SparkSession, dir: String) => {
      val docs = t(spark, dir, "documents")
      val wordStats = docs.select(col("doc_id"),
        size(words).as("n_words"),
        size(array_distinct(words)).as("n_uniq"))
      val bigrams = docs.select(col("doc_id"), explode(expr(
        graft.ops.TextAnalysis.bigramStringsExpr("text"))).as("bigram"))
      val bigramStats = bigrams
        .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).as("top_n"), sum(col("n")).as("total_bigrams"))
      wordStats.join(bigramStats, "doc_id")
        .withColumn("top_bigram_frac",
          col("top_n").cast("double") / col("total_bigrams").cast("double"))
        .withColumn("dup_word_frac",
          (col("n_words") - col("n_uniq")).cast("double") / col("n_words").cast("double"))
        .withColumn("flagged",
          col("top_bigram_frac") >= 0.07 || col("dup_word_frac") >= 0.65)
        .select(col("doc_id"), col("n_words"), col("top_n"),
          col("top_bigram_frac"), col("dup_word_frac"), col("flagged"))
        .orderBy("doc_id")
    }),

    // ---- qf02: Gopher-style document-level quality rules (Rae et al.
    // 2021, arXiv:2112.11446 §A1.1): word-count bounds, mean-word-length
    // band, alphabetic-word fraction, and a stopword-presence check, each
    // as its own flag plus the conjunctive pass decision a curation run
    // filters on. Pure codegen'd scan-local projection — zero shuffle at
    // any corpus size. Ratios are IEEE double divisions of exact ints.
    "qf02_gopher_rules" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "documents")
        .select(col("doc_id") +: gopherCols: _*)
        .withColumn("mean_wlen", col("sum_wlen").cast("double") / col("n_words").cast("double"))
        .withColumn("frac_alpha", col("n_alpha").cast("double") / col("n_words").cast("double"))
        .withColumn("r_words", col("n_words").between(GopherMinWords, GopherMaxWords))
        .withColumn("r_wlen", col("mean_wlen") >= GopherMinWlen && col("mean_wlen") <= GopherMaxWlen)
        .withColumn("r_alpha", col("frac_alpha") >= GopherMinAlpha)
        .withColumn("r_stop", col("n_stop") >= GopherMinStop)
        .withColumn("pass",
          col("r_words") && col("r_wlen") && col("r_alpha") && col("r_stop"))
        .select(col("doc_id"), col("n_words"), col("mean_wlen"), col("frac_alpha"),
          col("n_stop"), col("r_words"), col("r_wlen"), col("r_alpha"), col("r_stop"),
          col("pass"))
        .orderBy("doc_id")
    }),

    // ---- qf05: TRAINED quality classifier — full-batch gradient
    // descent on a linear model, in-engine, distilling qf02's rule
    // labeler into a cheap scorer (the CCNet/GPT-3 pipeline pattern:
    // train a linear/fastText-class model on heuristic quality labels,
    // then score the whole corpus with one projection). Training is
    // FIXED-POINT so it is bit-deterministic across runs, partitionings,
    // and engines (km01's quantized-Lloyd discipline applied to GD):
    // integer features, integer weights, a hard-sigmoid activation
    // clamp(z/4 + 1/2, 0, 1) instead of exp-based sigmoid (libm exp
    // differs across engines by ulps; clamp/mul/div do not), gradient
    // sums as exact int64, truncating-division updates.
    // Scale shape (100 TB): the feature relation is 4 ints per doc —
    // text is read ONCE and never again; each of the 8 iterations is
    // one scan of that skinny relation with a broadcast 1-row weight
    // vector and a 4-sum map-side-combinable aggregate (the classic
    // full-batch distributed GD shape); the final scoring pass is the
    // same broadcast-join projection. Output: per-label prediction
    // counts + the learned weights (per-class rows carry the same
    // weight columns, like km02's profile shape).
    "qf05_quality_classifier" -> ((spark: SparkSession, dir: String) => {
      // localCheckpoint: 9 scans (8 GD + 1 scoring) must not re-derive
      // the features from text 9 times — materialize the skinny ints.
      val feat = t(spark, dir, "documents")
        .select(col("doc_id") +: (gopherCols :+ size(array_distinct(words)).as("n_uniq")): _*)
        .select(
          when(gopherPass, 1L).otherwise(0L).as("y"),
          expr("(1000L * least(n_words, 100)) div 100L - 500L").as("x1"),
          expr("(1000L * n_uniq) div n_words - 500L").as("x2"),
          expr("(1000L * n_stop) div 6L - 500L").as("x3"))
        .localCheckpoint(true)
      val w0 = spark.range(1).select(
        lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"), lit(0L).as("w3"))
      val trained = (1 to LrIters).foldLeft(w0) { (w, _) =>
        // active region: 0 < u < 1000 (hard-sigmoid gradient 1/4, the
        // constant factor absorbed into LrMult); err = u - 1000*y there
        val g = feat.crossJoin(broadcast(w))
          .withColumn("u", expr(lrUSqlSpark))
          .withColumn("act", col("u") > 0L && col("u") < 1000L)
          .withColumn("err", col("u") - col("y") * 1000L)
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("act"), col("err") * 1000L).otherwise(0L)).as("g0"),
            sum(when(col("act"), col("err") * col("x1")).otherwise(0L)).as("g1"),
            sum(when(col("act"), col("err") * col("x2")).otherwise(0L)).as("g2"),
            sum(when(col("act"), col("err") * col("x3")).otherwise(0L)).as("g3"))
        g.crossJoin(broadcast(w)).select(
          expr(s"greatest(-$LrClamp, least($LrClamp, w0 - $LrMult * (g0 div n)))").as("w0"),
          expr(s"greatest(-$LrClamp, least($LrClamp, w1 - $LrMult * (g1 div n)))").as("w1"),
          expr(s"greatest(-$LrClamp, least($LrClamp, w2 - $LrMult * (g2 div n)))").as("w2"),
          expr(s"greatest(-$LrClamp, least($LrClamp, w3 - $LrMult * (g3 div n)))").as("w3"))
          .localCheckpoint(true) // 1 row; bounds lineage across iterations
      }
      feat.crossJoin(broadcast(trained))
        .withColumn("u", expr(lrUSqlSpark))
        .withColumn("pred", (col("u") >= 500L).cast("long"))
        .groupBy(col("y").as("label_quality"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("pred")).as("n_pred_quality"),
          sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"),
          max(col("w0")).as("w0"), max(col("w1")).as("w1"),
          max(col("w2")).as("w2"), max(col("w3")).as("w3"))
        .orderBy("label_quality")
    }),

    // ---- qf03: bigram-LM surprisal filter — the corpus estimates its
    // own bigram transition model P(w2|w1) = c(w1 w2)/c(w1 ·), and each
    // doc reports how many of its transitions are rare under that model
    // (p < 0.02), its minimum transition probability, and the rare
    // fraction a perplexity-style filter would threshold on. Log-free by
    // design: ln()/exp() differ across libm builds by ulps, while count,
    // min, and a single IEEE division hash-compare exactly — and
    // rare-fraction ranks docs the same way perplexity does (both are
    // monotone in "how unusual are this doc's transitions").
    // Scale shape (100 TB): the two count tables are vocab-sized (V and
    // V^2 entries, built by map-side-combinable aggregations of the gram
    // stream), so they BROADCAST back onto the corpus stream — the
    // per-doc pass never shuffles the corpus itself.
    "qf03_bigram_surprisal" -> ((spark: SparkSession, dir: String) => {
      // localCheckpoint: the gram stream feeds the two count tables AND
      // the probability join — without it the split+explode subtree
      // executes three times (the dd08/dd11 expression-reuse trap).
      val grams = t(spark, dir, "documents")
        .select(col("doc_id"), explode(expr(
          graft.ops.TextAnalysis.bigramPairsExpr("text"))).as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
        .localCheckpoint(true)
      val c12 = grams.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      val c1 = grams.groupBy("w1").agg(count(lit(1)).as("n1"))
      grams
        .join(broadcast(c12), Seq("w1", "w2"))
        .join(broadcast(c1), Seq("w1"))
        .withColumn("p", col("n12").cast("double") / col("n1").cast("double"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          min(col("p")).as("min_p"),
          sum(when(col("p") < 0.02, 1L).otherwise(0L)).as("n_rare"))
        .withColumn("rare_frac",
          col("n_rare").cast("double") / col("n_bigrams").cast("double"))
        .withColumn("flagged", col("rare_frac") >= 0.05)
        .select(col("doc_id"), col("n_bigrams"), col("min_p"),
          col("n_rare"), col("rare_frac"), col("flagged"))
        .orderBy("doc_id")
    }),

    // ---- qf04: token budget per quality decile — the curriculum /
    // mixing question asked after scoring: "if I keep only the top
    // deciles, how many tokens survive?" Design + determinism notes on
    // the shared `qualityDeciles` builder above (samp04 reuses it).
    "qf04_quality_deciles" -> ((spark: SparkSession, dir: String) =>
      qualityDeciles(spark, dir).orderBy("decile")),

    // ---- samp04: temperature-flattened mixing weights over the quality
    // deciles — the Pile/ROOTS-style reweighting that boosts rare
    // high-value strata: share_i ~ mass_i^(1/T). T = 2 exactly, because
    // x^(1/2) = sqrt(x) is CORRECTLY-ROUNDED IEEE in both the JVM and
    // libm — a general pow() differs across libm builds by ulps and
    // would break the hash gate (the same reasoning that keeps qf03
    // log-free). The weight normalizer is a 10-element IN-ORDER fold
    // over (decile-sorted) sqrt masses — a sum of doubles is only
    // deterministic with a pinned fold order.
    "samp04_temperature_mix" -> ((spark: SparkSession, dir: String) => {
      val dec = qualityDeciles(spark, dir).select("decile", "n_tokens")
      val tot = dec.agg(
        sum("n_tokens").as("tot_tokens"),
        expr("""aggregate(
          |  array_sort(collect_list(struct(decile, cast(n_tokens as double) as t))),
          |  0D, (acc, x) -> acc + sqrt(x.t))""".stripMargin).as("sum_w"))
      dec.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_tokens"),
          (col("n_tokens").cast("double") / col("tot_tokens").cast("double"))
            .as("raw_share"),
          (sqrt(col("n_tokens").cast("double")) / col("sum_w")).as("temp_share"))
        .withColumn("boost", col("temp_share") / col("raw_share"))
        .orderBy("decile")
    }),

    // ---- samp05: domain-mixture reweighting from LM surprisal — the
    // DoReMi question (Xie et al. 2023): upweight the domains the
    // reference model finds HARD (excess loss), downweight the easy
    // ones. The loss signal is t15's corpus-trained trigram LM,
    // aggregated per SOURCE in integer micro-nats (exact: the float
    // enters once per distinct trigram probability, is floored to
    // int64, and every aggregation after that is integer). The
    // published method's exponential tilt exp(η·excess) is replaced by
    // a LINEAR tilt 1e6 + excess_unats — same ordering, and unlike
    // exp()/pow() it is bit-deterministic across engines (the samp04
    // lesson: only sqrt and ln have cross-engine-exact precedent).
    // Scale shape: identical to t15 (count relations broadcast at test
    // scale, keyed shuffles at web scale); the per-source rollup adds
    // one source-grain aggregation and two 1-row broadcasts.
    "samp05_doremi_weights" -> ((spark: SparkSession, dir: String) => {
      val docs = t(spark, dir, "documents")
      val tri = docs
        .select(col("source"), explode(expr(
          graft.ops.TextAnalysis.trigramTriplesExpr("text"))).as("g"))
        .select(col("source"), col("g.w1").as("w1"),
          col("g.w2").as("w2"), col("g.w3").as("w3"))
        .localCheckpoint(true)
      val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
        .agg(countDistinct(col("tok")).as("v"))
      val c123 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n123"))
      val c12 = tri.groupBy("w1", "w2").agg(count(lit(1)).as("n12"))
      val perSource = tri.join(broadcast(c123), Seq("w1", "w2", "w3"))
        .join(broadcast(c12), Seq("w1", "w2"))
        .crossJoin(broadcast(vocab))
        .withColumn("unats", floor(-log(
          (col("n123") + 1).cast("double") / (col("n12") + col("v")).cast("double"))
          * lit(1e6)).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_trigrams"), sum("unats").as("total_unats"))
        .withColumn("avg_unats", expr("total_unats div n_trigrams"))
        .localCheckpoint(true) // feeds the min, the weights, and the total
      val minA = perSource.agg(min("avg_unats").as("min_unats"))
      val weighted = perSource.crossJoin(broadcast(minA))
        .withColumn("excess_unats", col("avg_unats") - col("min_unats"))
        .withColumn("wq", lit(1000000L) + col("excess_unats"))
      val tot = weighted.agg(sum("wq").as("wtot"))
      weighted.crossJoin(broadcast(tot))
        .select(col("source"), col("n_trigrams"), col("avg_unats"),
          col("excess_unats"),
          (col("wq").cast("double") / col("wtot").cast("double")).as("mix_weight"))
        .orderBy("source")
    }),

    // ---- cont01: benchmark-contamination screen — 4-gram overlap between
    // the corpus and a held-out benchmark set (here: doc_id % 97 == 0).
    // The benchmark gram set is DISTINCT'd and broadcast; the corpus side
    // streams through the join without shuffling — at 100 TB the corpus
    // never moves, only the (small) benchmark grams do.
    "cont01_contamination" -> ((spark: SparkSession, dir: String) => {
      val grams = t(spark, dir, "documents")
        .filter(size(words) >= 4)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(split(text, ' ')) - 3), i -> array_join(slice(split(text, ' '), i, 4), ' '))"))
          .as("gram"))
      val bench = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
      grams.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), "gram")
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("gram")).as("n_hit_grams"))
        .orderBy("doc_id")
    }),

    // ---- cont03: contamination SCORING — the GPT-3/PaLM appendix
    // method: per-document overlap FRACTION (distinct contaminated
    // n-grams / distinct n-grams) over the WHOLE corpus including
    // clean docs, with the drop flag at a threshold. cont01 surfaces
    // only hit counts for dirty docs; this is the decision artifact a
    // curation pass actually consumes. Same scale shape: benchmark
    // grams broadcast, corpus streams; the fraction is one IEEE
    // division per doc, and the >= 0.2 flag compares that exact
    // quotient — deterministic in both engines.
    "cont03_overlap_fraction" -> ((spark: SparkSession, dir: String) => {
      val grams = t(spark, dir, "documents")
        .filter(size(words) >= 4)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(split(text, ' ')) - 3), i -> array_join(slice(split(text, ' '), i, 4), ' '))"))
          .as("gram"))
      val bench = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
      val corpus = grams.filter(col("doc_id") % 97 =!= 0)
      val totals = corpus.groupBy("doc_id").agg(countDistinct(col("gram")).as("n_grams"))
      val hits = corpus.join(broadcast(bench), "gram")
        .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hit"))
      totals.join(hits, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_grams").cast("double")).as("overlap_frac"))
        .withColumn("contaminated", col("overlap_frac") >= 0.2)
        .orderBy("doc_id")
    }),

    // ---- cont02: the same contamination screen with a BLOOM PREFILTER —
    // the 100 TB shape: a bloom filter over the benchmark gram hashes
    // (built by Spark's own BloomFilterAggregate, registered as bloom_agg
    // since Spark keeps it SQL-internal) screens the corpus gram stream
    // BEFORE any join, so at scale ~99% of corpus grams die in the scan's
    // codegen stage; only bloom survivors reach the exact semi-join that
    // removes false positives. Result is therefore EXACTLY cont01's
    // semantics — the oracle is the plain exact SQL.
    "cont02_bloom_contamination" -> ((spark: SparkSession, dir: String) => {
      graft.functions.VectorFunctions.registerAll(spark)
      t(spark, dir, "documents").createOrReplaceTempView("graft_cont02_docs")
      spark.sql(
        """WITH g AS (
          |  SELECT doc_id, gram,
          |         cast(conv(substr(md5(gram), 1, 8), 16, 10) as bigint) AS h
          |  FROM (SELECT doc_id,
          |          explode(transform(sequence(1, size(split(text, ' ')) - 3),
          |            i -> array_join(slice(split(text, ' '), i, 4), ' '))) AS gram
          |        FROM graft_cont02_docs WHERE size(split(text, ' ')) >= 4)),
          |bench AS (SELECT DISTINCT gram, h FROM g WHERE doc_id % 97 = 0)
          |SELECT c.doc_id, count(DISTINCT c.gram) AS n_hit_grams
          |FROM g c
          |WHERE c.doc_id % 97 <> 0
          |  AND bloom_contains((SELECT bloom_agg(h, CAST(16384 AS BIGINT)) FROM bench), c.h)
          |  AND c.gram IN (SELECT gram FROM bench)
          |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin)
    }),

    // ---- shard01: deterministic corpus shuffle, sharded — the shape a
    // training run actually serves data in: docs land in one of 8 shards
    // by content-independent seeded hash (md5 of id, so a re-run, a
    // different partitioning, or a different engine produces the SAME
    // shard files), and each shard is internally shuffled by the full
    // digest. The global sort a naive "ORDER BY random()" implies never
    // happens — the window is per-shard, fully parallel, and at 100 TB
    // each shard writes independently.
    "shard01_shuffle_shards" -> ((spark: SparkSession, dir: String) => {
      val h = md5(concat(lit("shuf42:"), col("doc_id").cast("string")))
      val shard = pmod(expr(graft.ops.Dedup.h32("concat('shuf42:', cast(doc_id as string))")), lit(8))
      val w = Window.partitionBy(col("shard")).orderBy(col("shuf_key"), col("doc_id"))
      t(spark, dir, "documents")
        .select(col("doc_id"), shard.as("shard"), h.as("shuf_key"))
        .withColumn("pos", row_number().over(w))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),

    // ---- pack01: sequence packing — concatenate each language's token
    // stream in doc_id order and chop into fixed 512-token windows; each
    // doc reports the bin it starts in and its offset within the bin
    // (exactly how pre-training examples are packed into context windows).
    // One window shuffle keyed by lang; integer division end to end.
    "pack01_sequence_packing" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), size(words).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("bin", expr("(cum - n_tokens) div 512"))
        .withColumn("bin_offset", expr("(cum - n_tokens) % 512"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin"), col("bin_offset"))
        .orderBy("doc_id")
    }),

    // ---- chunk01: context-window chunking — slide a 32-token window
    // with stride 24 (8-token overlap) over each document's token stream;
    // one row per chunk with its offset, length, and content fingerprint
    // (how documents longer than the model context become training /
    // embedding examples; pack01 then packs the chunks). Scan-local:
    // explode of a per-doc start list, no shuffle before the output sort,
    // and only each chunk's md5 leaves the scan — the text never does.
    // sequence(0, n_words - 1, 24) is safe from the descending-sequence
    // trap: split() never returns an empty array, so the end bound >= 0.
    "chunk01_context_chunks" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_words", size(col("toks")))
        .withColumn("tok_start", explode(expr("sequence(0, n_words - 1, 24)")))
        .select(col("doc_id"),
          expr("tok_start div 24").as("chunk_id"),
          col("tok_start"),
          least(lit(32), col("n_words") - col("tok_start")).as("chunk_len"),
          md5(concat_ws(" ", expr("slice(toks, tok_start + 1, 32)"))).as("chunk_fp"))
        .orderBy("doc_id", "chunk_id")
    }),

    // ---- quant01: int8 symmetric embedding quantization — per-vector
    // scale = max|x|/127, q_i = floor(x_i * 127 / max|x|), plus the
    // reconstruction MSE the quantizer reports. Scan-local array math in
    // doubles; squared error via explicit multiply (pow() differs by ulps
    // across libm builds), in-order aggregate fold (matches list_sum).
    "quant01_int8_embeddings" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "embeddings")
        .withColumn("max_abs", expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
        .withColumn("scale", col("max_abs") / lit(127.0))
        .withColumn("mse", expr(
          """aggregate(embedding, cast(0.0 as double),
            |  (acc, x) -> acc + (cast(x as double) - floor(cast(x as double) * 127.0 / max_abs) * (max_abs / 127.0))
            |                  * (cast(x as double) - floor(cast(x as double) * 127.0 / max_abs) * (max_abs / 127.0)))
            |/ cast(size(embedding) as double)""".stripMargin))
        .select(col("vec_id"), col("label"), col("max_abs"), col("scale"), col("mse"))
        .orderBy("vec_id")
    }),

    // ---- c01: the composed curation pipeline — Gopher quality gate ->
    // exact-dedup keep -> deterministic split -> per-(split, lang) corpus
    // report, as ONE deferred plan (the "what ships to the trainer" query
    // a curation run ends with). Each stage reuses the exact expression
    // its standalone query is gated on (qf02 / dd01-dd09 / split01).
    // Scale shape (100 TB): the quality gate is a codegen'd scan-local
    // filter, so the dedup shuffle only carries survivors — and only 4
    // narrow columns (fp, doc_id, lang, n_words); the text itself never
    // shuffles. Two shuffles total: row_number by content fingerprint,
    // then a map-side-combinable groupBy on (split, lang).
    "c01_corpus_pipeline" -> ((spark: SparkSession, dir: String) => {
      val scored = t(spark, dir, "documents")
        .select(Seq(col("doc_id"), col("lang"), col("text")) ++ gopherCols: _*)
        .filter(gopherPass)
        .select(col("doc_id"), col("lang"), col("n_words"), md5(col("text")).as("fp"))
      val kept = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
      kept
        .withColumn("bucket", expr(splitBucketExpr))
        .withColumn("split",
          when(col("bucket") < 80, lit("train"))
            .when(col("bucket") < 90, lit("val"))
            .otherwise(lit("test")))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words_total"))
        .orderBy("split", "lang")
    }),

    // ---- c02: the composed VECTOR-ingestion pipeline — context-window
    // chunking (chunk01's exact expressions) -> feature-hash embedding
    // (the 16-component MinHash signature as an integer vector, reusing
    // the native shingle/minhash kernels) -> IVF list assignment against
    // 16 fixed seed-chunk centroids -> per-list index stats, as ONE
    // deferred plan: what a RAG/embedding ingestion run ends with.
    // Scale shape (100 TB): chunking and signatures are scan-local; the
    // 16-centroid relation collapses to one broadcast row and the argmin
    // runs inside the scan (Clustering.assign's shape); the only
    // shuffle is the final 16-group aggregation. Chunk text never
    // leaves the scan — only its 16-int signature does.
    // Determinism: signatures are md5-derived ints; squared distances
    // are exact int64 products summed in decimal(38,0) (a 31-bit
    // component diff squared is ~2^62 — 16 of them overflow int64, the
    // tri01 lesson); argmin ties break by centroid id.
    "c02_vector_pipeline" -> ((spark: SparkSession, dir: String) => {
      graft.functions.VectorFunctions.registerAll(spark)
      val chunks = t(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_words", size(col("toks")))
        .withColumn("tok_start", explode(expr("sequence(0, n_words - 1, 24)")))
        .select(col("doc_id"),
          expr("tok_start div 24").as("chunk_id"),
          least(lit(32), col("n_words") - col("tok_start")).as("chunk_len"),
          concat_ws(" ", expr("slice(toks, tok_start + 1, 32)")).as("chunk_text"))
      val sigs = chunks.select(col("doc_id"), col("chunk_id"), col("chunk_len"),
        call_function("minhash_sig",
          call_function("shingle_hashes", col("chunk_text"), lit(8)), lit(16)).as("sig"))
      val cents = sigs.filter(col("doc_id") < 16 && col("chunk_id") === 0)
        .select(col("doc_id").as("cid"), col("sig").as("m"))
        .agg(collect_list(struct(col("cid"), col("m"))).as("cs"))
      sigs.join(broadcast(cents))
        .withColumn("list_id", expr(
          """array_min(transform(cs, c -> struct(
            |  aggregate(zip_with(sig, c.m, (a, b) -> cast((a - b) * (a - b) as decimal(38,0))),
            |            cast(0 as decimal(38,0)), (acc, x) -> acc + x) as d,
            |  c.cid as cid))).cid""".stripMargin))
        .groupBy(col("list_id"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          (sum(col("chunk_len")).cast("double") /
            count(lit(1)).cast("double")).as("mean_chunk_len"))
        .orderBy("list_id")
    }))

  val oracles: Map[String, String] = Map(
    "c02_vector_pipeline" ->
      s"""WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks) AS n_words,
        |    unnest(range(0, len(toks), 24)) AS tok_start
        |  FROM d),
        |chunks AS (
        |  SELECT doc_id, tok_start // 24 AS chunk_id,
        |    least(32, n_words - tok_start) AS chunk_len,
        |    array_to_string(toks[tok_start + 1 : tok_start + 32], ' ') AS chunk_text
        |  FROM s),
        |sig AS (
        |  SELECT doc_id, chunk_id, chunk_len,
        |    [${(0 until 16).map(j => DedupQueries.minhashSqlOf(j, "chunk_text")).mkString(", ")}] AS sig
        |  FROM chunks),
        |cents AS (SELECT doc_id AS cid, sig AS m FROM sig WHERE doc_id < 16 AND chunk_id = 0),
        |dist AS (
        |  SELECT s2.doc_id, s2.chunk_id, s2.chunk_len, c.cid,
        |    list_sum(list_transform(list_zip(s2.sig, c.m),
        |      p -> CAST(p[1] - p[2] AS HUGEINT) * (p[1] - p[2]))) AS dd
        |  FROM sig s2 CROSS JOIN cents c),
        |assigned AS (
        |  SELECT doc_id, chunk_id, chunk_len, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY doc_id, chunk_id ORDER BY dd, cid) AS rn
        |    FROM dist) WHERE rn = 1)
        |SELECT list_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(CAST(sum(chunk_len) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mean_chunk_len
        |FROM assigned GROUP BY list_id ORDER BY list_id""".stripMargin,

    "samp03_dsir_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 8))::BIGINT) % 64 AS bucket
        |  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
        |tc AS (SELECT bucket, count(*) AS n_t FROM pairs WHERE lang = 'en' GROUP BY bucket),
        |rc AS (SELECT bucket, count(*) AS n_r FROM pairs WHERE lang <> 'en' GROUP BY bucket),
        |sc AS (
        |  SELECT b.bucket,
        |    ((coalesce(n_t, 0) + 1) * CAST(1000000 AS BIGINT)) // (coalesce(n_r, 0) + 1) AS s
        |  FROM (SELECT unnest(range(0, 64)) AS bucket) b
        |  LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)),
        |w AS (
        |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS weight, count(*) AS n_bigrams
        |  FROM pairs JOIN sc USING (bucket) WHERE lang <> 'en' GROUP BY doc_id),
        |top AS (
        |  SELECT doc_id, weight, n_bigrams,
        |    CAST(row_number() OVER (ORDER BY weight DESC, doc_id) AS INT) AS rk
        |  FROM w)
        |SELECT rk, doc_id, weight, n_bigrams FROM top WHERE rk <= 100 ORDER BY rk""".stripMargin,

    "qf02_gopher_rules" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    $gopherColsSql
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_words,
        |    CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) AS mean_wlen,
        |    CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) AS frac_alpha,
        |    n_stop,
        |    n_words BETWEEN $GopherMinWords AND $GopherMaxWords AS r_words
        |  FROM m)
        |SELECT doc_id, n_words, mean_wlen, frac_alpha, n_stop, r_words,
        |  (mean_wlen >= $GopherMinWlen AND mean_wlen <= $GopherMaxWlen) AS r_wlen,
        |  frac_alpha >= $GopherMinAlpha AS r_alpha,
        |  n_stop >= $GopherMinStop AS r_stop,
        |  (r_words AND (mean_wlen >= $GopherMinWlen AND mean_wlen <= $GopherMaxWlen)
        |    AND frac_alpha >= $GopherMinAlpha AND n_stop >= $GopherMinStop) AS pass
        |FROM r ORDER BY doc_id""".stripMargin,

    "qf05_quality_classifier" -> {
      // one CTE pair (gradient sums, updated weights) per unrolled GD
      // iteration, each referencing the previous weight CTE — the exact
      // integer arithmetic of the Spark fold, bpeStepCte-style
      val iterCtes = (1 to LrIters).map { i =>
        val wp = if (i == 1) "w0cte" else s"w${i - 1}"
        s"""g$i AS (
           |  SELECT count(*) AS n,
           |    CAST(SUM(CASE WHEN u > 0 AND u < 1000 THEN (u - y * 1000) * 1000 ELSE 0 END) AS BIGINT) AS g0,
           |    CAST(SUM(CASE WHEN u > 0 AND u < 1000 THEN (u - y * 1000) * x1 ELSE 0 END) AS BIGINT) AS g1,
           |    CAST(SUM(CASE WHEN u > 0 AND u < 1000 THEN (u - y * 1000) * x2 ELSE 0 END) AS BIGINT) AS g2,
           |    CAST(SUM(CASE WHEN u > 0 AND u < 1000 THEN (u - y * 1000) * x3 ELSE 0 END) AS BIGINT) AS g3
           |  FROM (SELECT f.*, $lrUSqlDuck AS u FROM f, $wp)),
           |w$i AS (
           |  SELECT
           |    GREATEST(-$LrClamp, LEAST($LrClamp, w0 - $LrMult * CAST(g0 // n AS BIGINT))) AS w0,
           |    GREATEST(-$LrClamp, LEAST($LrClamp, w1 - $LrMult * CAST(g1 // n AS BIGINT))) AS w1,
           |    GREATEST(-$LrClamp, LEAST($LrClamp, w2 - $LrMult * CAST(g2 // n AS BIGINT))) AS w2,
           |    GREATEST(-$LrClamp, LEAST($LrClamp, w3 - $LrMult * CAST(g3 // n AS BIGINT))) AS w3
           |  FROM g$i, $wp)""".stripMargin
      }.mkString(",\n")
      s"""WITH m AS (
        |  SELECT doc_id,
        |    $gopherColsSql,
        |    len(list_distinct(string_split(text, ' '))) AS n_uniq
        |  FROM documents),
        |f AS (
        |  SELECT CASE WHEN n_words BETWEEN $GopherMinWords AND $GopherMaxWords
        |      AND CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinWlen
        |      AND CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) <= $GopherMaxWlen
        |      AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinAlpha
        |      AND n_stop >= $GopherMinStop THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS y,
        |    $lrFeatSqlDuck
        |  FROM m),
        |w0cte AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
        |          CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
        |$iterCtes
        |SELECT y AS label_quality, count(*) AS n_docs,
        |  CAST(SUM(pred) AS BIGINT) AS n_pred_quality,
        |  CAST(SUM(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  MAX(w0) AS w0, MAX(w1) AS w1, MAX(w2) AS w2, MAX(w3) AS w3
        |FROM (SELECT f.y, CASE WHEN $lrUSqlDuck >= 500 THEN CAST(1 AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END AS pred, w0, w1, w2, w3
        |      FROM f, w$LrIters)
        |GROUP BY y ORDER BY label_quality""".stripMargin
    },

    "pii02_k_anonymity" ->
      """SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
        |  CAST(FLOOR(c_acctbal / 2000.0) AS INT) AS bal_band,
        |  COUNT(*) AS class_size, COUNT(*) >= 5 AS k_anonymous
        |FROM customer
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "pii01_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org'
         |         WHEN doc_id % 4 = 1 THEN ' call 555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
         |         WHEN doc_id % 4 = 2 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
         |         ELSE '' END AS record
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(record, '$EmailRe')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(record, '$PhoneRe')) AS INT) AS n_phone,
         |  CAST(len(regexp_extract_all(record, '$IpRe')) AS INT) AS n_ip,
         |  regexp_replace(record, '$AnyPiiRe', '[PII]', 'g') AS redacted
         |FROM r ORDER BY doc_id""".stripMargin,

    "split01_hash_split" ->
      s"""WITH b AS (
        |  SELECT doc_id, lang,
        |    $splitBucketSql AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "split02_split_sizes" ->
      s"""WITH b AS (
        |  SELECT doc_id, lang,
        |    $splitBucketSql AS bucket
        |  FROM documents),
        |s AS (SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, lang, COUNT(*) AS n_docs FROM s GROUP BY split, lang
        |ORDER BY split, lang""".stripMargin,

    "samp02_weighted_mix" ->
      """WITH b AS (
        |  SELECT doc_id, source, lang,
        |    ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000 AS bucket,
        |    CASE CAST(substr(source, 4) AS INT) % 4
        |      WHEN 0 THEN 10000 WHEN 1 THEN 5000 WHEN 2 THEN 2500 ELSE 1000 END AS thr
        |  FROM documents)
        |SELECT doc_id, source, lang FROM b WHERE bucket < thr ORDER BY doc_id""".stripMargin,

    "qf01_repetition_filter" ->
      """WITH ws AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |    len(list_distinct(string_split(text, ' '))) AS n_uniq
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bigram
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, MAX(n) AS top_n, CAST(SUM(n) AS BIGINT) AS total_bigrams FROM
        |    (SELECT doc_id, bigram, COUNT(*) AS n FROM g GROUP BY doc_id, bigram)
        |  GROUP BY doc_id),
        |j AS (
        |  SELECT ws.doc_id AS doc_id, n_words, top_n,
        |    CAST(top_n AS DOUBLE) / CAST(total_bigrams AS DOUBLE) AS top_bigram_frac,
        |    CAST(n_words - n_uniq AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_frac
        |  FROM ws JOIN bg ON ws.doc_id = bg.doc_id)
        |SELECT doc_id, n_words, top_n, top_bigram_frac, dup_word_frac,
        |  (top_bigram_frac >= 0.07 OR dup_word_frac >= 0.65) AS flagged
        |FROM j ORDER BY doc_id""".stripMargin,

    "qf03_bigram_surprisal" ->
      """WITH g AS (
        |  SELECT doc_id, string_split(text, ' ')[i] AS w1, string_split(text, ' ')[i + 1] AS w2
        |  FROM documents, unnest(range(1, len(string_split(text, ' ')))) AS t(i)),
        |c12 AS (SELECT w1, w2, count(*) AS n12 FROM g GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM g GROUP BY 1),
        |p AS (
        |  SELECT doc_id, CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p
        |  FROM g JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
        |d AS (
        |  SELECT doc_id, count(*) AS n_bigrams, min(p) AS min_p,
        |    CAST(sum(CASE WHEN p < 0.02 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM p GROUP BY 1)
        |SELECT doc_id, n_bigrams, min_p, n_rare,
        |  CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS rare_frac,
        |  CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE) >= 0.05 AS flagged
        |FROM d ORDER BY doc_id""".stripMargin,

    "qf04_quality_deciles" ->
      s"""$qualityDecilesCte
        |SELECT * FROM deciles ORDER BY decile""".stripMargin,

    "samp04_temperature_mix" ->
      s"""$qualityDecilesCte,
        |dw AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |  list_sum(list_transform(list(CAST(n_tokens AS DOUBLE) ORDER BY decile),
        |    x -> sqrt(x))) AS sum_w
        |  FROM deciles)
        |SELECT d.decile, d.n_tokens,
        |  CAST(d.n_tokens AS DOUBLE) / CAST(w.tot_tokens AS DOUBLE) AS raw_share,
        |  sqrt(CAST(d.n_tokens AS DOUBLE)) / w.sum_w AS temp_share,
        |  (sqrt(CAST(d.n_tokens AS DOUBLE)) / w.sum_w)
        |    / (CAST(d.n_tokens AS DOUBLE) / CAST(w.tot_tokens AS DOUBLE)) AS boost
        |FROM deciles d, dw w ORDER BY d.decile""".stripMargin,

    "samp05_doremi_weights" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |tri AS (
        |  SELECT source, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
        |  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
        |  WHERE len(t) >= 3),
        |uni AS (
        |  SELECT COUNT(DISTINCT tok) AS v
        |  FROM (SELECT UNNEST(t) AS tok FROM toks)),
        |c123 AS (SELECT w1, w2, w3, COUNT(*) AS n123 FROM tri GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM tri GROUP BY 1, 2),
        |scored AS (
        |  SELECT tri.source,
        |    CAST(FLOOR(-LN(CAST(n123 + 1 AS DOUBLE) / CAST(n12 + v AS DOUBLE))
        |      * 1000000.0) AS BIGINT) AS unats
        |  FROM tri
        |  JOIN c123 USING (w1, w2, w3)
        |  JOIN c12 USING (w1, w2), uni),
        |per_src AS (
        |  SELECT source, COUNT(*) AS n_trigrams,
        |    CAST(SUM(unats) // COUNT(*) AS BIGINT) AS avg_unats
        |  FROM scored GROUP BY source),
        |m AS (SELECT MIN(avg_unats) AS mn FROM per_src),
        |wq AS (
        |  SELECT source, n_trigrams, avg_unats,
        |    avg_unats - mn AS excess_unats,
        |    1000000 + avg_unats - mn AS w
        |  FROM per_src, m),
        |tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM wq)
        |SELECT source, n_trigrams, avg_unats,
        |  CAST(excess_unats AS BIGINT) AS excess_unats,
        |  CAST(w AS DOUBLE) / CAST(wt AS DOUBLE) AS mix_weight
        |FROM wq, tot ORDER BY source""".stripMargin,

    "cont03_overlap_fraction" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) - 2),
        |    i -> array_to_string(string_split(text, ' ')[i:i+3], ' '))) AS gram
        |  FROM documents),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |corpus AS (SELECT * FROM g WHERE doc_id % 97 <> 0),
        |tot AS (SELECT doc_id, COUNT(DISTINCT gram) AS n_grams FROM corpus GROUP BY doc_id),
        |hit AS (
        |  SELECT c.doc_id AS doc_id, COUNT(DISTINCT c.gram) AS n_hit
        |  FROM corpus c JOIN bench b ON c.gram = b.gram GROUP BY c.doc_id)
        |SELECT t.doc_id AS doc_id, n_grams, coalesce(n_hit, 0) AS n_hit,
        |  CAST(coalesce(n_hit, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_frac,
        |  CAST(coalesce(n_hit, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.2 AS contaminated
        |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
        |ORDER BY doc_id""".stripMargin,

    "cont01_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) - 2),
        |    i -> array_to_string(string_split(text, ' ')[i:i+3], ' '))) AS gram
        |  FROM documents)
        |SELECT c.doc_id AS doc_id, COUNT(DISTINCT c.gram) AS n_hit_grams
        |FROM g c JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0) b ON c.gram = b.gram
        |WHERE c.doc_id % 97 <> 0
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    // Exact semantics — the bloom stage is a superset prefilter whose
    // false positives are removed by the exact semi-join, so the oracle
    // is the same exact SQL as cont01.
    "cont02_bloom_contamination" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(string_split(text, ' ')) - 2),
        |    i -> array_to_string(string_split(text, ' ')[i:i+3], ' '))) AS gram
        |  FROM documents)
        |SELECT c.doc_id AS doc_id, COUNT(DISTINCT c.gram) AS n_hit_grams
        |FROM g c JOIN (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0) b ON c.gram = b.gram
        |WHERE c.doc_id % 97 <> 0
        |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,

    "shard01_shuffle_shards" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('shuf42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT) % 8 AS shard,
        |    md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS shuf_key
        |  FROM documents)
        |SELECT doc_id, shard, pos FROM (
        |  SELECT doc_id, shard,
        |    row_number() OVER (PARTITION BY shard ORDER BY shuf_key, doc_id) AS pos
        |  FROM s)
        |ORDER BY doc_id""".stripMargin,

    "pack01_sequence_packing" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM tok)
        |SELECT doc_id, lang, n_tokens, (cum - n_tokens) // 512 AS bin,
        |  (cum - n_tokens) % 512 AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "chunk01_context_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, len(toks) AS n_words,
        |    unnest(range(0, len(toks), 24)) AS tok_start
        |  FROM d)
        |SELECT doc_id, tok_start // 24 AS chunk_id, tok_start,
        |  least(32, n_words - tok_start) AS chunk_len,
        |  md5(array_to_string(toks[tok_start + 1 : tok_start + 32], ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "quant01_int8_embeddings" ->
      """WITH m AS (
        |  SELECT vec_id, label, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
        |  FROM embeddings)
        |SELECT vec_id, label, max_abs, max_abs / 127.0 AS scale,
        |  list_sum(list_transform(embedding,
        |    x -> (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127.0 / max_abs) * (max_abs / 127.0))
        |       * (CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * 127.0 / max_abs) * (max_abs / 127.0))))
        |  / CAST(len(embedding) AS DOUBLE) AS mse
        |FROM m ORDER BY vec_id""".stripMargin,

    "c01_corpus_pipeline" ->
      s"""WITH m AS (
        |  SELECT doc_id, lang, text,
        |    $gopherColsSql
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, n_words, md5(text) AS fp FROM m
        |  WHERE n_words BETWEEN $GopherMinWords AND $GopherMaxWords
        |    AND CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinWlen
        |    AND CAST(sum_wlen AS DOUBLE) / CAST(n_words AS DOUBLE) <= $GopherMaxWlen
        |    AND CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= $GopherMinAlpha
        |    AND n_stop >= $GopherMinStop),
        |k AS (
        |  SELECT doc_id, lang, n_words FROM (
        |    SELECT p.*, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rk FROM p)
        |  WHERE rk = 1),
        |s AS (
        |  SELECT lang, n_words,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, lang, n_words, $splitBucketSql AS b
        |        FROM k))
        |SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_words_total
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
  )
}
