package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication library over document DataFrames — the programmatic API
  * behind the dd* queries. Every primitive is a pure column expression or
  * a key join; nothing collects to the driver; every "random" hash is
  * md5-derived, so results are deterministic across runs, partitionings,
  * and engines.
  *
  * Scale shapes:
  *  - exact: one shuffle on the content hash;
  *  - MinHash LSH: signature scan (one md5 pass) -> band explode ->
  *    equi-join on (band, signature) -> exact-Jaccard verify of the
  *    candidates only. Never an all-pairs product.
  *  - SimHash: scan-local 32-bit sketch; near-dup = small Hamming radius.
  */
object Dedup {

  /** Distinct character n-gram shingles of `text`. */
  def shinglesExpr(textCol: String, n: Int = 8): String =
    s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), i -> substr($textCol, i, $n)))"

  /** Unsigned 32-bit hash from md5 — the portable hash primitive. */
  def h32(e: String): String = s"cast(conv(substr(md5($e), 1, 8), 16, 10) as bigint)"

  /** One shared md5 pass over the shingles. */
  def shingleHashesExpr(textCol: String, n: Int = 8): String =
    s"transform(${shinglesExpr(textCol, n)}, s -> ${h32("s")})"

  /** MinHash_j over precomputed hashes: universal family a_j=2j+1,
    * b_j=j*j+7, p=2^31-1. */
  def minhashOver(xs: String, j: Int): String =
    s"array_min(transform($xs, x -> ((${2 * j + 1}L * x + ${j * j + 7}L) % 2147483647L)))"

  /** Exact-dup clusters: one row per distinct content, keeper = min id. */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_doc_id"), count(lit(1)).as("n_copies"))

  /** Corpus with exact duplicates removed (keeps the min-id copy). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exactClusters(df, idCol, textCol).select(col("keeper_doc_id").as(idCol))
    df.join(keepers, idCol)
  }

  /** doc id + mh0..mh{k-1} MinHash signature columns. Native kernels:
    * `shingle_hashes` fuses window + distinct + md5-h32 into one compiled
    * pass, `minhash_sig` folds all k hash functions in one traversal —
    * same values as the declarative forms (see ShingleExpressions), ~4x
    * faster per scanned row. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int = 16): DataFrame = {
    graft.functions.VectorFunctions.registerAll(df.sparkSession)
    df.select(col(idCol), call_function("shingle_hashes", col(textCol), lit(8)).as("__xs"))
      .select(col(idCol), call_function("minhash_sig", col("__xs"), lit(k)).as("__sig"))
      .select(col(idCol) +: (0 until k).map(j => element_at(col("__sig"), j + 1).as(s"mh$j")): _*)
  }

  /** (id, band, band_sig) relation: each doc's MinHash signature split
    * into `bands` row-groups, each concatenated into one join key. This
    * is the unit of LSH blocking — docs sharing any (band, band_sig) are
    * near-dup candidates. Exposed so cross-corpus flows (a new batch vs
    * an existing corpus, dd12) can band each side independently and
    * equi-join, instead of self-joining one combined relation. */
  def bandSignatures(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    bandSignaturesFromSigs(
      minhashSignatures(df, idCol, textCol, bands * rowsPerBand), idCol, bands, rowsPerBand)

  /** Band an ALREADY-COMPUTED signature relation (mh0..mh{k-1} columns).
    * Use this when the signatures are needed downstream anyway (dd14's
    * estimate join) — banding from them avoids a second full scan +
    * shingle/minhash pass over the corpus text. */
  def bandSignaturesFromSigs(sigs: DataFrame, idCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    sigs.select(col(idCol), posexplode(array((0 until bands).map(b =>
        concat_ws("_", (b * rowsPerBand until (b + 1) * rowsPerBand).map(r => col(s"mh$r")): _*)): _*))
      .as(Seq("band", "band_sig")))
  }

  /** LSH candidate pairs from banded signatures (bands x rowsPerBand = k).
    * The band relation is eagerly localCheckpoint'd: both sides of the
    * self-join read the materialized partitions (a plain cache() would pin
    * storage for the session with no release point for callers). */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val bandRel = bandSignatures(df, idCol, textCol, bands, rowsPerBand)
      .localCheckpoint(true)
    bandRel.as("x").join(bandRel.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"))
      .distinct()
  }

  /** Position-level k-token span hashes — one row per token position,
    * hashing the k-token window starting there. This is the substring-
    * granularity dedup primitive (duplicated LONG SPANS between otherwise
    * distinct documents drive memorization; whole-doc similarity misses
    * them — cf. "Deduplicating Training Data Makes Language Models
    * Better", Lee et al. 2022, the suffix-array ExactSubstr method this
    * approximates with fixed-k windows). */
  def spanHashes(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame =
    df.filter(size(split(col(textCol), " ")) >= k)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, size(split($textCol, ' ')) - ${k - 1}), " +
          s"i -> md5(concat_ws(' ', slice(split($textCol, ' '), i, $k))))")).as("span_hash"))

  /** Per-doc duplicated-span stats: n_spans, how many of them also occur
    * in ANOTHER doc, and the covered fraction. Single scan, two shuffles
    * (window keyed by span_hash, then groupBy doc) — a span is cross-doc
    * duplicated iff min(id) != max(id) over its hash partition, so no
    * join against a shared-span relation and no re-scan of the corpus. */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("span_hash")
    spanHashes(df, idCol, textCol, k)
      .withColumn("__dup", min(col(idCol)).over(w) =!= max(col(idCol)).over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("__dup"), lit(1))).as("n_dup_spans"))
      .withColumn("dup_ratio",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** ExactSubstr EXCISION (the transformation behind Lee et al. 2022,
    * arXiv:2107.06499, here with fixed-k windows instead of a suffix
    * array): every k-token window whose text occurs elsewhere in the
    * corpus is CUT from its document — except the corpus-wide first
    * occurrence (minimal (doc_id, pos)), which is kept so exactly one
    * copy of every repeated passage survives. Overlapping/adjacent cut
    * windows merge into maximal spans; the surviving tokens re-join into
    * the cleaned document. dd10 MEASURES duplicated-span coverage; this
    * produces the rewritten corpus a curation run actually ships.
    *
    * Scale: one corpus scan emits the (doc, pos, hash) window relation;
    * the keep/cut decision is one row_number window keyed by span hash
    * (the same shuffle class as dd10); the islands merge runs over ONLY
    * the cut windows (duplicate-sized, not corpus-sized); reassembly is
    * per-doc array expressions after one doc_id-keyed join of the
    * (small) islands relation onto the token arrays — AQE broadcasts it
    * when the duplicate set is small, and no window ever spans the
    * un-partitioned corpus.
    */
  def exciseDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), split(col(textCol), " ").as("toks"))
    val spans = toks.filter(size(col("toks")) >= k)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, size(toks) - ${k - 1}), " +
          s"i -> md5(concat_ws(' ', slice(toks, i, $k))))")).as(Seq("p0", "h")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("h"))
    // keeper = first occurrence corpus-wide; every later one is cut
    val cut = spans
      .withColumn("rk", row_number().over(
        Window.partitionBy("h").orderBy(col(idCol), col("pos"))))
      .filter(col("rk") > 1)
      .select(col(idCol), col("pos"), (col("pos") + (k - 1)).as("e"))
    // gaps-and-islands: windows starting <= prev_max_end + 1 merge
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    val islands = cut
      .withColumn("brk", when(col("pos") > coalesce(
          max("e").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(-1)) + 1, 1).otherwise(0))
      .withColumn("island", sum("brk").over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min("pos").as("s"), max("e").as("e"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("s"), col("e"))).as("islands"),
        count(lit(1)).as("n_spans_cut"),
        sum(col("e") - col("s") + 1).as("n_tokens_cut"))
    toks.join(islands, Seq(idCol), "left_outer")
      .select(col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_spans_cut"), lit(0L)).as("n_spans_cut"),
        coalesce(col("n_tokens_cut"), lit(0L)).as("n_tokens_cut"),
        (coalesce(col("n_tokens_cut"), lit(0L)).cast("double") /
          size(col("toks")).cast("double")).as("cut_ratio"),
        when(col("islands").isNull, array_join(col("toks"), " "))
          .otherwise(expr(
            """array_join(transform(filter(
              |  zip_with(toks, sequence(1, size(toks)), (t, i) -> struct(t as t, i as i)),
              |  x -> !exists(islands, sp -> x.i >= sp.s AND x.i <= sp.e)),
              |  x -> x.t), ' ')""".stripMargin))
          .as("clean_text"))
  }

  /** Flags each batch doc against an existing corpus — the incremental-
    * ingestion shape: at 100 TB you never re-dedup the whole corpus when
    * a new crawl lands; you test the batch against the corpus's content
    * fingerprints and LSH band keys (both precomputable artifacts — the
    * corpus side here reduces to DISTINCT fp / DISTINCT (band, band_sig)
    * relations, which a production pipeline would persist and reuse).
    * Output: one row per batch doc with exact_dup / near_dup / keep. */
  def incrementalDedupFlags(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val corpusFp = corpus.select(md5(col(textCol)).as("fp")).distinct()
    val corpusBands = bandSignatures(corpus, idCol, textCol)
      .select(col("band"), col("band_sig")).distinct()
    incrementalDedupFlagsFromIndex(corpusFp, corpusBands, batch, idCol, textCol)
  }

  /** Same decision, but against a PRE-BUILT corpus index (the persisted
    * DISTINCT fp / (band, band_sig) relations) — the form the streaming
    * gate reuses every micro-batch without re-deriving the corpus side. */
  def incrementalDedupFlagsFromIndex(corpusFp: DataFrame, corpusBands: DataFrame,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nearIds = bandSignatures(batch, idCol, textCol)
      .join(corpusBands, Seq("band", "band_sig"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__near", lit(1))
    batch.select(col(idCol), md5(col(textCol)).as("fp"))
      .join(corpusFp.withColumn("__exact", lit(1)), Seq("fp"), "left_outer")
      .join(nearIds, Seq(idCol), "left_outer")
      .select(col(idCol),
        col("__exact").isNotNull.as("exact_dup"),
        col("__near").isNotNull.as("near_dup"))
      .withColumn("keep", !col("exact_dup") && !col("near_dup"))
  }

  /** Exact n-gram Jaccard for given (doc_a, doc_b) pairs — the verify
    * stage downstream of LSH candidate generation. */
  def jaccardVerify(df: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.registerAll(df.sparkSession)
    // String shingles (not hashes): intersect/union sizes must be exact —
    // an md5 collision would silently perturb a Jaccard value.
    val sh = df.select(col(idCol), call_function("shingles", col(textCol), lit(8)).as("sh"))
    val a = sh.select(col(idCol).as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col(idCol).as("doc_b"), col("sh").as("sh_b"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-dup pairs at `threshold`: LSH candidates + exact verify. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    jaccardVerify(df, idCol, textCol, lshCandidates(df, idCol, textCol), threshold)

  /** 32-bit SimHash from frequency-weighted word-hash bit votes: one md5
    * pass builds the word-hash array, then the native codegen'd
    * `simhash_bits` kernel folds all 32 bit votes in a single traversal
    * (the declarative 32x`aggregate(...)` form re-walked the array per bit
    * in interpreted closures — 6x slower per scanned row). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.VectorFunctions.registerAll(df.sparkSession)
    df.select(col(idCol),
      expr(s"transform(split($textCol, ' '), w -> ${h32("w")})").as("__wh"))
      .select(col(idCol), call_function("simhash_bits", col("__wh")).as("simhash"))
  }

  /** Hamming-radius pairs over simhashes via 4-segment pigeonhole
    * blocking: a pair within distance <= 3 must agree exactly on at least
    * one of the 4 8-bit segments, so the (segment idx, segment value)
    * equi-join has FULL recall only for maxHamming <= 3 — larger radii
    * would silently miss pairs, hence the hard requirement. */
  def simhashNearPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"4-segment pigeonhole blocking guarantees recall only for maxHamming <= 3, got $maxHamming")
    val sh = simhash(df, idCol, textCol).localCheckpoint(true)
    val seg = sh.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(s =>
        expr(s"shiftright(simhash, ${s * 8}) % 256")): _*)).as(Seq("seg", "seg_val")))
    // The Hamming bound is evaluated INSIDE the join: low-entropy segments
    // make some (seg, seg_val) buckets huge (quadratic candidates), and
    // filtering during the probe keeps those candidates from ever being
    // materialized — the distinct() then shuffles only the surviving
    // pairs (narrow rows), not the full candidate stream.
    seg.as("x").join(seg.as("y"),
        col("x.seg") === col("y.seg") && col("x.seg_val") === col("y.seg_val") &&
          col(s"x.$idCol") < col(s"y.$idCol") &&
          expr("bit_count(x.simhash ^ y.simhash)") <= maxHamming)
      .select(col(s"x.$idCol").as("doc_a"), col(s"y.$idCol").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").as("hamming"))
      .distinct()
  }
}
