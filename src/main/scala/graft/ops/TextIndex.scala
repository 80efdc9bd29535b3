package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED INVERTED TEXT INDEX over a TxLog corpus table — the
  * sparse-retrieval (Lucene-shaped) architecture re-expressed as lake
  * relations, the text twin of [[BloomIndex]]:
  *
  *  - `<index>`: the POSTINGS table — one row per (document, term):
  *    (term_hash, term, doc_id, tf, dl), written range-CLUSTERED by
  *    term_hash so a query term's postings resolve through the log's
  *    footer [min,max] pruning to ~one file — the posting-list seek of
  *    an inverted index, expressed as ordinary stats skipping;
  *  - `<index>_stats`: one row (n_docs, total_len) — the corpus-global
  *    scalars BM25 needs (N, avgdl), maintained incrementally;
  *  - `<index>_files`: the indexed corpus files (names), the
  *    incremental-maintenance watermark ([[BloomIndex]]'s discipline).
  *
  * SERVING never touches the corpus: [[searchBm25]] reads the query
  * terms' pruned postings + the 1-row stats table and produces EXACTLY
  * the ranking of the in-query BM25 (t14 — same tokenizer, same
  * always-positive idf, same k1/b, same round-6 + doc_id tie-break), so
  * one DuckDB oracle cross-gates the scan path and the index path.
  * Query cost tracks the query terms' posting lists, not the corpus —
  * the property that makes retrieval over 100 TB feasible.
  *
  * Maintenance: [[ensureIndexed]] indexes corpus files not yet in the
  * watermark, anti-joined on doc_id against the already-indexed docs so
  * it is IDEMPOTENT under redelivery and correct across corpus
  * compaction (a rewritten file re-presents old docs; the guard keeps
  * their postings single). [[pruneDeleted]] merge-on-read deletes the
  * postings of removed documents (churn-sized — the caller knows its
  * deleted keys, the GDPR flow). All document-granular: corpus
  * compaction never invalidates postings the way it invalidates
  * file-granular bloom rows.
  *
  * The reference has no text indexing (its documents are opaque JSON,
  * SURVEY §1.1); this exists for the LLM-pipeline pillar's retrieval
  * primitives (decontamination, hard-negative mining, dedup-by-query).
  *
  * CONCURRENCY CONTRACT: maintenance (ensureIndexed / ensurePositional
  * / pruneDeleted / maintain) assumes a SINGLE maintainer per index —
  * the standard shape for derived-artifact jobs (one stream, one cron).
  * Within that contract every entry point is idempotent under crash
  * and redelivery (watermark diff + doc_id anti-join; prune no-ops on
  * already-pruned keys). Two maintainers racing the SAME index could
  * each observe the pre-append watermark and double-index a file —
  * serialize them upstream (the streaming twins do: one query, ordered
  * micro-batches). SERVING is lock-free and always consistent: every
  * read resolves one committed snapshot.
  */
object TextIndex {

  /** Postings of `docs` under the t14 tokenizer (space-split, exact). */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), split(col(textCol), " ").as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("dl"), explode(col("__ws")).as("term"))
      .groupBy("doc_id", "term")
      .agg(max(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .select(xxhash64(col("term")).as("term_hash"), col("term"),
        col("doc_id"), col("tf"), col("dl"))

  private def statsDir(index: Path): Path = index.resolveSibling(index.getFileName + "_stats")
  private def filesDir(index: Path): Path = index.resolveSibling(index.getFileName + "_files")
  private def metaDir(index: Path): Path = index.resolveSibling(index.getFileName + "_meta")
  private def tstatsDir(index: Path): Path = index.resolveSibling(index.getFileName + "_tstats")
  private def tstatsMetaDir(index: Path): Path =
    index.resolveSibling(index.getFileName + "_tstats_meta")

  /** Range-MONOTONE cluster bucket of term_hash. Clustering by the raw
    * column would hash-partition it (repartition's exchange), giving
    * every file a near-full-range footer [min,max] on a real vocabulary
    * — pruning power only by accident. The arithmetic shift keeps
    * bucket order = term_hash order, so each clustered write's files
    * are DISJOINT slices of the signed-64 term_hash axis and a term
    * lookup prunes to exactly one file per clustered file-set. */
  private def clusterBucket(n: Int): org.apache.spark.sql.Column =
    expr(s"int(((shiftright(term_hash, 32) + 2147483648L) * ${n}L) div 4294967296L)")

  /** The index's self-describing corpus binding (id/text column, cluster
    * count), written once at creation so lifecycle maintenance can
    * re-index new corpus files without the caller re-stating them.
    * None when the _meta sidecar is absent — maintenance must NOT guess
    * a binding (a legacy index built with non-default columns would be
    * silently re-indexed under the wrong one, corrupting postings). */
  private def readMeta(spark: SparkSession, index: Path): Option[(String, String, Int)] =
    if (TxLog.versions(metaDir(index)).isEmpty) None
    else {
      val r = TxLog.cachedHeadRow(spark, metaDir(index))
      Some((r.getString(r.fieldIndex("id_col")), r.getString(r.fieldIndex("text_col")),
        r.getInt(r.fieldIndex("n_clusters"))))
    }

  /** Whether the index carries its self-describing binding — the gate
    * auto-maintenance must check before driving [[maintain]]. */
  def hasMeta(index: Path): Boolean = TxLog.versions(metaDir(index)).nonEmpty

  /** Index every live corpus file not yet in the watermark: postings
    * range-clustered by term_hash, stats and watermark advanced, each
    * step one commit. Returns the number of newly indexed documents.
    * First call on an empty index IS the build. */
  def ensureIndexed(spark: SparkSession, corpus: Path, index: Path,
      idCol: String = "doc_id", textCol: String = "text",
      nClusters: Int = 8): Long = Jobs.labeled(spark, "text ensureIndexed") {
    import spark.implicits._
    // args-vs-binding consistency: an index already bound to one
    // (id, text, clusters) triple must not ingest under another
    readMeta(spark, index).foreach { case (i0, t0, n0) =>
      require(i0 == idCol && t0 == textCol && n0 == nClusters,
        s"index at $index is bound to (id=$i0, text=$t0, clusters=$n0); " +
          s"ensureIndexed called with ($idCol, $textCol, $nClusters)")
    }
    // backfill the binding even on a no-op call, so a legacy
    // (pre-_meta) index becomes maintainable after one explicit
    // ensureIndexed with its original arguments
    if (TxLog.versions(metaDir(index)).isEmpty)
      TxLog.append(spark,
        Seq((idCol, textCol, nClusters)).toDF("id_col", "text_col", "n_clusters"),
        metaDir(index), "n_clusters"): Unit
    val snap = TxLog.snapshotAt(corpus)
    val indexed: Set[String] =
      TxLog.cachedStringSet(spark, filesDir(index), "file_name")
    val newFiles = snap.files.filterNot(f => indexed(f.path))
    if (newFiles.isEmpty) return 0L
    val docs = TxLog.readFiles(spark, corpus, newFiles)
    val fresh0 = postingsOf(docs, idCol, textCol)
    // idempotency + compaction correctness: a rewritten file re-presents
    // docs the index already carries — their postings must stay single
    val fresh =
      if (indexed.isEmpty) fresh0
      else fresh0.join(
        TxLog.readAt(spark, index).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // the fresh postings feed the clustered write AND the stats agg
    val mat = fresh.localCheckpoint(true)
    val inc = mat.groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("len")).head
    val (nNew, lenNew) = (inc.getLong(0), inc.getLong(1))
    if (nNew > 0) {
      val pv = TxLog.appendClustered(spark, mat, index, "term_hash",
        clusterBucket(nClusters), nClusters)
      // the _tstats dictionary delta (per-term df, the dl-free impact
      // ceiling max tf/(tf+k1(1-b)), the slice's top (tf, dl) pairs,
      // and the postings-commit binding): LOG-STRUCTURED — each
      // increment appends its own range-clustered slice, reads SUM
      // across slices, maintain folds to the exact single row per
      // term. No vocab-sized rewrite on the increment path. The
      // CREATING write derives from ALL live postings, not just this
      // increment — a pre-dictionary index upgraded mid-life would
      // otherwise carry a silently PARTIAL dictionary and misrank
      // every query touching the uncovered terms; such a write spans
      // many commits' files, so its slice binding is -1 (unbound:
      // block-max falls back to hash-range reads for it).
      val creating = TxLog.versions(tstatsDir(index)).isEmpty
      upgradeTstatsSchema(spark, index)
      // creating on a FRESH index (no postings commit before pv): the
      // live postings ARE `mat` — derive the dictionary from the
      // already-checkpointed increment instead of re-reading the just-
      // written files (VERDICT r15 #6: one aggregation source, no
      // second corpus-sized pass on the build path). Only a mid-life
      // upgrade (prior postings commits exist) must read the full index.
      val hadPrior = TxLog.versions(index).exists(_ < pv)
      val dictSrc = if (creating && hadPrior) TxLog.readAt(spark, index) else mat
      val sliceVer = if (creating && hadPrior) -1L else pv
      TxLog.appendClustered(spark, tstatsDelta(spark, dictSrc, sliceVer),
        tstatsDir(index), "term_hash", clusterBucket(nClusters), nClusters): Unit
      if (TxLog.versions(tstatsMetaDir(index)).isEmpty)
        writeTstatsMeta(spark, index, (0L, 0L))
    }
    // stats: one-row overwrite (versioned like everything else; the
    // first increment is the creating append). Prior scalars resolve
    // from driver footer metadata (scalarsOf) — the increment path pays
    // no Spark job to read a 1-row table it wrote itself.
    writeStats(spark, index,
      if (TxLog.versions(statsDir(index)).isEmpty) (nNew, lenNew)
      else {
        val s = scalarsOf(spark, statsDir(index), Seq("n_docs", "total_len"))
        (s(0) + nNew, s(1) + lenNew)
      })
    TxLog.append(spark,
      newFiles.map(_.path).toDF("file_name"), filesDir(index), "file_name"): Unit
    nNew
  }

  /** BM25 top-k served from the INDEX ALONE — per query term one
    * footer-pruned point read of the postings (range on term_hash, the
    * exact term re-checked so a 64-bit hash collision costs nothing),
    * document frequency from the pruned postings themselves, N/avgdl
    * from the 1-row stats table. Identical arithmetic, rounding, and
    * tie-break to the in-query t14 ranking. */
  def searchBm25(spark: SparkSession, index: Path, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "searchBm25 needs at least one query term")
    val posts = terms.distinct.map { term =>
      val h = termHash(term)
      TxLog.readAt(spark, index, range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(term))
    }.reduce(_ unionByName _)
    val dfRel = posts.groupBy("term").agg(count(lit(1)).as("df"))
    bm25Rank(posts, dfRel, statsRel(spark, index), k)
  }

  /** The 1-row (n_docs, avgdl) relation BM25 serving cross-joins in:
    * resolved from DRIVER footer metadata (scalarsOf — zero Spark jobs
    * for the 1-row stats table; the searchBm25BlockMax discipline,
    * identical IEEE division, tix gates pin hash-equality). */
  private def statsRel(spark: SparkSession, index: Path): DataFrame = {
    import spark.implicits._
    val s = scalarsOf(spark, statsDir(index), Seq("n_docs", "total_len"))
    Seq((s(0), s(1).toDouble / s(0).toDouble)).toDF("n_docs", "avgdl")
  }

  /** The ONE BM25 readout (arithmetic, rounding, tie-break) — shared by
    * every search mode so a bounds-pruned ranking cannot drift from the
    * full-scoring one by so much as an ulp. */
  private def bm25Rank(posts: DataFrame, dfRel: DataFrame, st: DataFrame,
      k: Int): DataFrame =
    posts.join(broadcast(dfRel), "term")
      .crossJoin(broadcast(st))
      .select(col("doc_id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          col("tf").cast("double") /
          (col("tf").cast("double") +
            lit(1.2) * (lit(1.0) - 0.75 +
              lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .as("part"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** CONJUNCTIVE (AND) retrieval: only documents containing EVERY query
    * term rank, scored by the same BM25 arithmetic as [[searchBm25]].
    * The intersection runs on the pruned posting lists themselves
    * (group by doc_id, keep count(distinct term) == |terms|) — cost
    * still tracks the query terms' posting lists, never the corpus,
    * and the most selective term bounds the candidate set the way a
    * production conjunctive engine's shortest-list-first walk does. */
  def searchBm25All(spark: SparkSession, index: Path, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "searchBm25All needs at least one query term")
    val distinct = terms.distinct
    val posts = distinct.map { term =>
      val h = termHash(term)
      TxLog.readAt(spark, index, range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(term))
    }.reduce(_ unionByName _)
    val all = posts.groupBy("doc_id")
      .agg(countDistinct(col("term")).as("__nt"))
      .filter(col("__nt") === distinct.size)
      .select("doc_id")
    val dfRel = posts.groupBy("term").agg(count(lit(1)).as("df"))
    bm25Rank(posts.join(broadcast(all), Seq("doc_id"), "left_semi"), dfRel,
      statsRel(spark, index), k)
  }

  /** What a [[searchBm25MaxScore]] call decided: which lists were
    * scored in full, which were only probed for already-found
    * candidates, and the dictionary-counted postings behind each —
    * the gated/spec'd evidence that pruning happened. */
  final case class MaxScoreReport(essential: Seq[String], skipped: Seq[String],
      postingsTotal: Long, postingsEssential: Long, fellBack: Boolean,
      dfRecounted: Boolean)

  /** Disjunctive (OR) BM25 top-k with MAXSCORE bounds (Turtle & Flood
    * 1995; the block-max refinement is Ding & Suel, SIGIR 2011) —
    * result EXACTLY equals [[searchBm25]]'s, postings cost tracks the
    * ESSENTIAL lists only. The _tstats dictionary sidecar carries each
    * term's (df, max tf/(tf+k1(1-b))): u_t = idf(df) * that bound is a
    * per-doc score ceiling independent of dl/avgdl (dl > 0 only shrinks
    * the part), so with θ̂ = the k-th best single-list partial score of
    * the top-impact list, every term whose suffix-sum of ceilings stays
    * below θ̂ is NON-ESSENTIAL: a doc absent from all essential lists
    * scores strictly under θ̂ ≤ the true k-th score and cannot rank.
    * Non-essential lists are then only PROBED for candidates the
    * essential lists produced (semi-join on doc_id — footer-pruned
    * point reads either way), never scored in full. A 1e-6 margin
    * absorbs the round-6 readout so a pruned doc cannot tie its way
    * back in (margin 1e-5 in the code — belt over the 5e-7 braces).
    * SAFETY: the dictionary's df is exact under pure increments;
    * [[pruneDeleted]] marks it stale-HIGH (n_deleted advances past
    * refreshed_at) and the search then RECOUNTS the query terms' live
    * dfs in one scan-only pass over their pruned lists (term column
    * only — no join, no shuffle), restoring exact bounds and exact
    * scoring without losing the pruning; [[maintain]] folds the
    * dictionary exact again and reopens the recount-free path. Bounds
    * are never guessed; with no dictionary at all (pre-upgrade index)
    * the search falls back to full scoring. */
  def searchBm25MaxScore(spark: SparkSession, index: Path, terms: Seq[String],
      k: Int): (DataFrame, MaxScoreReport) = {
    require(terms.nonEmpty, "searchBm25MaxScore needs at least one query term")
    val distinct = terms.distinct
    def fallback = (searchBm25(spark, index, terms, k),
      MaxScoreReport(distinct, Nil, -1L, -1L, fellBack = true,
        dfRecounted = false))
    if (TxLog.versions(tstatsDir(index)).isEmpty) return fallback
    val (nDel, refreshedAt) = readTstatsMeta(spark, index)
    val nDocs = scalarsOf(spark, statsDir(index), Seq("n_docs"))(0)
    def pointRead(t: String, h: Long) =
      TxLog.readAt(spark, index, range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(t))
    // dictionary point reads: per term one footer-pruned file, all
    // terms unioned into ONE job, reduced to (df, bound) — |terms| rows
    // on the driver, never a posting; absent terms simply yield no row
    // (they contribute nothing in either search mode)
    val stored = distinct.map { term =>
      val h = termHash(term)
      TxLog.readAt(spark, tstatsDir(index), range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(term))
    }.reduce(_ unionByName _)
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"), max(col("tf_bound")).as("b"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    // DELETE STALENESS: pruneDeleted leaves the dictionary's df
    // stale-HIGH (idf under-bounded — unsafe for selection AND wrong
    // for scoring). Rather than giving up all pruning until maintain,
    // recount the query terms' LIVE dfs in one scan-only job over
    // their pruned lists (reads the term column, no join, no shuffle):
    // selection bounds and scoring both become exact again. The
    // tf_bound stays valid under deletes (a max over a superset).
    // Staleness is derived from the INDEX ITSELF, not only from
    // pruneDeleted's counter: ANY deletion-vector sidecar on a live
    // postings file means rows left since the dictionary refresh (a
    // caller running TxLog.deleteMor on the index directly — the exact
    // pattern the ANN gates use on their index tables), so the counter
    // alone would under-detect and break the exact-equality contract.
    // [[maintain]] is the one supported DV-folding rewrite, and it
    // rebuilds the dictionary in the same pass — so "no DVs and
    // counters equal" genuinely implies an exact dictionary.
    val dvsPresent = TxLog.snapshotAt(index).files.exists(_.dv.isDefined)
    val dfRecounted = nDel != refreshedAt || dvsPresent
    val dfExact: Map[String, Long] =
      if (!dfRecounted) stored.map(s => s._1 -> s._2).toMap
      else distinct.map(t => pointRead(t, termHash(t)))
        .reduce(_ unionByName _)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dict = stored.flatMap { case (t, _, b) =>
      dfExact.get(t).filter(_ > 0).map(df => (t, termHash(t), df, b))
    }
    if (dict.isEmpty)
      return (TxLog.readAt(spark, index).filter(lit(false))
        .select(col("doc_id"), lit(0.0).as("score")),
        MaxScoreReport(Nil, distinct, 0L, 0L, fellBack = false, dfRecounted))
    val ceil = dict.map { case (t, h, df, b) =>
      (t, h, df, math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * b)
    }.sortBy { case (t, _, _, u) => (-u, t) }
    val st = statsRel(spark, index)
    import spark.implicits._
    val dfRel = broadcast(ceil.map(c => (c._1, c._3)).toDF("term", "df"))
    // θ̂: the k-th best single-list partial of the top-impact list —
    // every such doc's TRUE score only grows, so θ_true >= θ̂
    val (t1, h1, _, _) = ceil.head
    val thetaRow = bm25Rank(pointRead(t1, h1), dfRel, st, k)
      .agg(count(lit(1)).as("n"), coalesce(min(col("score")), lit(0.0)).as("kth")).head
    val theta =
      if (thetaRow.getLong(0) < k) Double.NegativeInfinity else thetaRow.getDouble(1)
    // essential = minimal prefix whose complement's ceiling-sum cannot
    // reach θ̂ (strictly, with the rounding margin)
    val suffix = ceil.map(_._4).scanRight(0.0)(_ + _).tail // suffix(i) = Σ_{j>i} u_j
    val nEss = (1 to ceil.size).find(j => suffix(j - 1) < theta - 1e-5)
      .getOrElse(ceil.size)
    val (ess, rest) = ceil.splitAt(nEss)
    val essPosts = ess.map(c => pointRead(c._1, c._2)).reduce(_ unionByName _)
    val posts =
      if (rest.isEmpty) essPosts
      else {
        val cands = essPosts.select("doc_id").distinct()
        essPosts.unionByName(
          rest.map(c => pointRead(c._1, c._2)).reduce(_ unionByName _)
            .join(cands, Seq("doc_id"), "left_semi"))
      }
    (bm25Rank(posts, dfRel, st, k),
      MaxScoreReport(ess.map(_._1), rest.map(_._1),
        ceil.map(_._3).sum, ess.map(_._3).sum, fellBack = false, dfRecounted))
  }

  /** What a [[searchBm25BlockMax]] call decided: unit (term × slice)
    * granularity selection, and the files it actually touched vs the
    * per-term point reads full scoring pays. */
  final case class BlockMaxReport(unitsTotal: Int, unitsEssential: Int,
      filesFull: Int, filesRead: Int, filesProbed: Int,
      fellBack: Boolean, dfRecounted: Boolean, thetaFromDict: Boolean)

  /** BLOCK-MAX disjunctive BM25 top-k (Ding & Suel, SIGIR 2011 — the
    * per-block refinement of [[searchBm25MaxScore]]'s Turtle & Flood
    * bounds), re-expressed over the lake layout: a "block" here is a
    * DICTIONARY SLICE — one incremental [[ensureIndexed]] commit's
    * postings for one term, bound to its commit's files via
    * `slice_ver` — so bounds live at (term × file-set) granularity and
    * whole FILES are skipped, not just whole terms. Result EXACTLY
    * equals [[searchBm25]] (same bm25Rank readout; tix11 gates the
    * hash), cost tracks the essential units:
    *
    *  1. θ̂ WITHOUT a postings job: each slice stores its top (tf, dl)
    *     pairs; the k-th best recomputed partial over any ONE term's
    *     pooled pairs lower-bounds that list's k-th partial (a subset's
    *     k-th best never exceeds the full list's), which lower-bounds
    *     the true k-th score — the max over terms is the tightest such
    *     θ̂. Under delete staleness stored pairs may name dead docs
    *     (θ̂ would overshoot — unsafe), so θ̂ falls back to one live
    *     bm25Rank job on the top-ceiling term, and df is recounted
    *     scan-only, the searchBm25MaxScore discipline.
    *  2. UNIT SELECTION, greedy peel: units sorted by ceiling
    *     u = idf·tf_bound descending move into the essential set until
    *     Σ_t max{u(t,s) : (t,s) non-essential} < θ̂ − margin. Any doc
    *     absent from every essential unit appears in at most one
    *     non-essential unit PER TERM, so its score is at most that
    *     remaining-max sum — it cannot reach the k-th place.
    *  3. READS in file space: essential units read exactly their
    *     slice's live files (hash-range fallback when the binding is
    *     unbound or rewritten); every doc read is a candidate. The
    *     candidates' remaining postings are PROBED from each term's
    *     not-yet-read files, doc_id-footer-range pruned against the
    *     candidate id span — the file skip that makes a long-lived
    *     multi-increment index serve like a maintained one.
    *
    * Safety mirrors searchBm25MaxScore: no dictionary, or a
    * pre-slice_ver dictionary, falls back to exact full scoring. */
  def searchBm25BlockMax(spark: SparkSession, index: Path, terms: Seq[String],
      k: Int): (DataFrame, BlockMaxReport) = {
    require(terms.nonEmpty, "searchBm25BlockMax needs at least one query term")
    require(k >= 1, "searchBm25BlockMax needs k >= 1")
    val distinct = terms.distinct
    def fallback = (searchBm25(spark, index, terms, k),
      BlockMaxReport(distinct.size, distinct.size, -1, -1, -1,
        fellBack = true, dfRecounted = false, thetaFromDict = false))
    if (TxLog.versions(tstatsDir(index)).isEmpty) return fallback
    val dictCols = TxLog.tableSchema(tstatsDir(index))
      .map(_.fieldNames.toSet).getOrElse(Set.empty)
    if (!dictCols("slice_ver") || !dictCols("top_pairs")) return fallback
    import spark.implicits._
    val snap = TxLog.snapshotAt(index)
    val byPath = snap.files.map(f => f.path -> f).toMap
    // corpus scalars from driver metadata (scalarsOf): no Spark job
    val stVals = scalarsOf(spark, statsDir(index), Seq("n_docs", "total_len"))
    val nDocs = stVals(0)
    val avgdl = stVals(1).toDouble / nDocs.toDouble
    // ---- dictionary rows, VERSION-KEYED per-JVM cached (the Lucene
    // shape: the term dictionary lives in serving memory) — a term's
    // slices are immutable for a given _tstats version, so steady-state
    // serving pays ZERO dictionary jobs; any dictionary commit (new
    // slice, maintain rebuild) changes the version and drops the key
    val dictVer = TxLog.latestVersion(tstatsDir(index))
    val dictKeyBase = s"${tstatsDir(index).toAbsolutePath}@$dictVer#"
    val misses = distinct.filter(t => !dictCache.containsKey(dictKeyBase + t))
    if (misses.nonEmpty) {
      val fetched = misses.map { term =>
        val h = termHash(term)
        TxLog.readAt(spark, tstatsDir(index), range = Some(("term_hash", h, h)))
          .filter(col("term") === lit(term))
          .select(col("term"), col("df"), col("tf_bound"), col("top_pairs"),
            col("slice_ver"))
      }.reduce(_ unionByName _).collect().toSeq.map { r =>
        val pairs =
          if (r.isNullAt(3)) Seq.empty[(Long, Long)]
          else r.getSeq[org.apache.spark.sql.Row](3)
            .map(p => { val id = p.getLong(1); (id & 0xFFFFFL, id >>> 20) })
        DictRow(r.getString(0), r.getLong(1), r.getDouble(2), pairs,
          if (r.isNullAt(4)) -1L else r.getLong(4))
      }.groupBy(_.term)
      if (dictCache.size > 65536) dictCache.clear() // bounded serving heap
      misses.foreach(t =>
        dictCache.put(dictKeyBase + t, fetched.getOrElse(t, Nil)))
    }
    final case class U(term: String, h: Long, df: Long, bound: Double,
        pairs: Seq[(Long, Long)], ver: Long)
    val units: Seq[U] = distinct
      .flatMap(t => Option(dictCache.get(dictKeyBase + t)).getOrElse(Nil))
      .map(d => U(d.term, termHash(d.term), d.df, d.bound, d.pairs, d.ver))
    def pointRead(t: String, h: Long) =
      TxLog.readAt(spark, index, range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(t))
    // ---- staleness (the searchBm25MaxScore rule: counter OR DVs)
    val (nDel, refreshedAt) = readTstatsMeta(spark, index)
    val stale = nDel != refreshedAt || snap.files.exists(_.dv.isDefined)
    val dfExact: Map[String, Long] =
      if (!stale) units.groupBy(_.term).view.mapValues(_.map(_.df).sum).toMap
      else distinct.map(t => pointRead(t, termHash(t)))
        .reduce(_ unionByName _)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val live = units.filter(u => dfExact.getOrElse(u.term, 0L) > 0)
    val filesFull = distinct.map(t =>
      TxLog.pruneFiles(snap, termHash(t), termHash(t)).size).sum
    if (live.isEmpty)
      return (TxLog.readAt(spark, index).filter(lit(false))
        .select(col("doc_id"), lit(0.0).as("score")),
        BlockMaxReport(units.size, 0, filesFull, 0, 0,
          fellBack = false, dfRecounted = stale, thetaFromDict = false))
    val idf: Map[String, Double] = dfExact.collect { case (t, df) if df > 0 =>
      t -> math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    val dfRel = broadcast(
      idf.keys.toSeq.sorted.map(t => (t, dfExact(t))).toDF("term", "df"))
    val stDf = broadcast(Seq((nDocs, avgdl)).toDF("n_docs", "avgdl"))
    // ---- θ̂
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def partial(t: String, tf: Long, dl: Long): Double =
      idf(t) * tf.toDouble /
        (tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * dl.toDouble / avgdl))
    val thetaFromDict = !stale
    val theta: Double =
      if (thetaFromDict)
        live.groupBy(_.term).map { case (t, us) =>
          val ps = us.flatMap(_.pairs).map { case (tf, dl) => round6(partial(t, tf, dl)) }
            .sorted(Ordering[Double].reverse)
          if (ps.size >= k) ps(k - 1) else Double.NegativeInfinity
        }.max
      else {
        val top = live.minBy(u => (-(idf(u.term) * u.bound), u.term, u.ver))
        val row = bm25Rank(pointRead(top.term, top.h), dfRel, stDf, k)
          .agg(count(lit(1)).as("n"), coalesce(min(col("score")), lit(0.0)).as("kth"))
          .head
        if (row.getLong(0) < k) Double.NegativeInfinity else row.getDouble(1)
      }
    // ---- greedy unit peel (driver-side, |terms × slices| work)
    val ordered = live.sortBy(u => (-(idf(u.term) * u.bound), u.term, u.ver))
    val remaining = scala.collection.mutable.Map.empty[String, List[Double]] ++
      ordered.groupBy(_.term).view.mapValues(
        _.map(u => idf(u.term) * u.bound).sorted(Ordering[Double].reverse).toList)
    def totalBound: Double =
      remaining.valuesIterator.map(l => if (l.isEmpty) 0.0 else l.head).sum
    var essN = 0
    while (essN < ordered.size && totalBound >= theta - 1e-5) {
      remaining(ordered(essN).term) = remaining(ordered(essN).term).tail
      essN += 1
    }
    if (essN == 0) essN = 1 // defensive: θ̂ is witnessed by a real doc
    val ess = ordered.take(essN)
    // ---- essential reads: each unit exactly its slice's live files
    val addsCache = scala.collection.mutable.Map.empty[Long, Vector[TxLog.AddFile]]
    def unitFiles(u: U): Vector[TxLog.AddFile] = {
      val bound: Option[Vector[TxLog.AddFile]] =
        if (u.ver < 0) None
        else {
          val adds = addsCache.getOrElseUpdate(u.ver, TxLog.addsAt(index, u.ver))
          if (!adds.forall(a => byPath.contains(a.path))) None // rewritten since
          else Some(adds.map(a => byPath(a.path))
            .filter(f => f.minKey <= u.h && u.h <= f.maxKey))
        }
      bound.getOrElse(TxLog.pruneFiles(snap, u.h, u.h))
    }
    val essFiles: Seq[(U, Vector[TxLog.AddFile])] = ess.map(u => (u, unitFiles(u)))
    val essPosts = essFiles.map { case (u, fs) =>
      TxLog.readFiles(spark, index, fs)
        .filter(col("term_hash") === u.h && col("term") === lit(u.term))
    }.reduce(_ unionByName _)
    val essPathsByTerm: Map[String, Set[String]] =
      essFiles.groupBy(_._1.term).view
        .mapValues(us => us.flatMap(_._2.map(_.path): Seq[String]).toSet).toMap
    val cands = essPosts.select("doc_id").distinct()
    // candidate doc_id SPAN from the essential files' footer stats —
    // driver metadata, no job; a file-level superset of the true span,
    // so pruning on it is conservative and correctness-free
    val essFilesAll = essFiles.flatMap(_._2)
    val essDocStats = essFilesAll.flatMap(_.cols.get("doc_id"))
    val candSpan: Option[(Long, Long)] =
      if (essFilesAll.isEmpty) Some((Long.MaxValue, Long.MinValue)) // no candidates
      else if (essDocStats.size == essFilesAll.size)
        Some((essDocStats.map(_._1).min, essDocStats.map(_._2).max))
      else None // a file without doc_id stats: span unknown, no span prune
    // ---- probes: candidates' remaining postings, file-pruned twice
    // (hash range minus already-read, then the candidate span vs each
    // file's recorded doc_id footer range)
    val candsRel =
      if (essFilesAll.map(_.rows).sum <= (1L << 22)) broadcast(cands) else cands
    val probes: Seq[(DataFrame, Int)] =
      if (essFilesAll.isEmpty) Nil
      else live.map(_.term).distinct.flatMap { t =>
        val h = termHash(t)
        val readPaths = essPathsByTerm.getOrElse(t, Set.empty)
        val rem = TxLog.pruneFiles(snap, h, h)
          .filterNot(f => readPaths(f.path))
          .filter(f => candSpan.forall { case (clo, chi) =>
            f.cols.get("doc_id").forall { case (lo, hi) => hi >= clo && lo <= chi }
          })
        if (rem.isEmpty) None
        else Some((TxLog.readFiles(spark, index, rem)
          .filter(col("term_hash") === h && col("term") === lit(t))
          .join(candsRel, Seq("doc_id"), "left_semi"), rem.size))
      }
    val filesRead = essFiles.map(_._2.size).sum + probes.map(_._2).sum
    val posts = (essPosts +: probes.map(_._1)).reduce(_ unionByName _)
    (bm25Rank(posts, dfRel, stDf, k),
      BlockMaxReport(units.size, essN, filesFull, filesRead,
        probes.map(_._2).sum, fellBack = false, dfRecounted = stale,
        thetaFromDict = thetaFromDict))
  }

  /** The end-user search shape: BM25 rank from the INDEX, then fetch
    * the winners' FULL ROWS from the corpus — the top-k ids (k-sized,
    * driver-held by construction) turn into a stats-pruned corpus read
    * ([min,max] key range + an isin residual that pushes into the
    * parquet scan), so the corpus pays a point-fetch, never a scan.
    * Returns the corpus columns + `score`, ranked. */
  def fetchTopDocs(spark: SparkSession, corpus: Path, index: Path,
      terms: Seq[String], k: Int, idCol: String = "doc_id"): DataFrame = {
    import spark.implicits._
    val top = searchBm25(spark, index, terms, k).collect() // k rows, by contract
    if (top.isEmpty)
      return TxLog.readAt(spark, corpus).filter(lit(false))
        .withColumn("score", lit(0.0))
    val ids = top.map(_.getLong(0))
    val scores = top.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      .toDF(idCol, "score")
    TxLog.readAt(spark, corpus, range = Some((idCol, ids.min, ids.max)))
      .filter(col(idCol).isin(ids.map(Long.box).toSeq: _*))
      .join(broadcast(scores), idCol)
      .orderBy(col("score").desc, col(idCol).asc)
  }

  private def posDir(index: Path): Path = index.resolveSibling(index.getFileName + "_pos")
  private def posFilesDir(index: Path): Path = index.resolveSibling(index.getFileName + "_pos_files")

  /** POSITIONAL postings — the OPTIONAL sibling table phrase queries
    * need: one row per term OCCURRENCE (term_hash, term, doc_id, pos),
    * range-clustered by term_hash like the frequency postings, with
    * its own watermark under the same diff + doc_id-anti-join
    * discipline (idempotent under redelivery, compaction-proof).
    * Kept separate from [[ensureIndexed]]'s table so BM25 serving
    * never pays the ~dl-times-larger occurrence rows. */
  def ensurePositional(spark: SparkSession, corpus: Path, index: Path,
      idCol: String = "doc_id", textCol: String = "text",
      nClusters: Int = 8): Long = {
    val pd = posDir(index)
    val wm = posFilesDir(index)
    val snap = TxLog.snapshotAt(corpus)
    val indexed: Set[String] = TxLog.cachedStringSet(spark, wm, "file_name")
    val newFiles = snap.files.filterNot(f => indexed(f.path))
    if (newFiles.isEmpty) return 0L
    val docs = TxLog.readFiles(spark, corpus, newFiles)
    val fresh0 = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .select(xxhash64(col("term")).as("term_hash"), col("term"),
        col("doc_id"), col("pos"))
    val fresh =
      if (indexed.isEmpty) fresh0
      else fresh0.join(
        TxLog.readAt(spark, pd).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
    // one tokenize pass: the occurrence rows feed the count AND the
    // clustered write (the ensureIndexed `mat` discipline — without the
    // checkpoint both actions re-run the corpus scan + posexplode)
    val mat = fresh.localCheckpoint(true)
    val nNew = mat.select("doc_id").distinct().count()
    if (nNew > 0)
      TxLog.appendClustered(spark, mat, pd, "term_hash",
        clusterBucket(nClusters), nClusters): Unit
    import spark.implicits._
    TxLog.append(spark,
      newFiles.map(_.path).toDF("file_name"), wm, "file_name"): Unit
    nNew
  }

  /** EXACT-PHRASE search from the positional index: each term's pruned
    * occurrence list is read as (doc_id, pos - i) — aligning a match's
    * occurrences to one shared start position — and the |phrase|-way
    * equi-join keeps exactly the starts where every term sits at its
    * offset. Cost tracks the phrase terms' occurrence lists (the rarest
    * term bounds the join), never the corpus: the exact-substring
    * decontamination primitive served from a lake artifact. Returns
    * (doc_id, n_occurrences) for matching documents. */
  def searchPhrase(spark: SparkSession, index: Path, phrase: String): DataFrame = {
    val terms = phrase.split(" ").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "searchPhrase needs a non-empty phrase")
    val reads = terms.zipWithIndex.map { case (term, i) =>
      val h = termHash(term)
      TxLog.readAt(spark, posDir(index), range = Some(("term_hash", h, h)))
        .filter(col("term") === lit(term))
        .select(col("doc_id"), (col("pos") - i).as("p0"))
    }
    reads.reduce((a, b) => a.join(b, Seq("doc_id", "p0")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("doc_id"))
  }

  /** Postings of an explicit TERM SET — the decontamination primitive:
    * the query terms (benchmark-sized by contract, the pruneDeleted
    * discipline) each resolve to their covering clustered files by a
    * driver-side stats intersection (sorted-hash binary search per
    * file), so the scan reads only files that can hold ANY queried
    * term — |terms| point reads on a 100 TB index, never an index
    * scan. Exact terms re-checked by semi-join, so 64-bit collisions
    * cost nothing; the term_hash in-filter pushes into the parquet
    * scan when the set is small enough to inline. */
  def postingsForTerms(spark: SparkSession, index: Path, terms: DataFrame,
      termCol: String = "term"): DataFrame = {
    val t = terms.select(col(termCol).as("term")).distinct()
      .withColumn("term_hash", xxhash64(col("term")))
      .localCheckpoint(true) // hashed once: feeds the prune AND the re-check
    val hashes = t.select("term_hash").collect().map(_.getLong(0)).sorted
    val snap = TxLog.snapshotAt(index)
    val files = snap.files.filter { f =>
      val i = java.util.Arrays.binarySearch(hashes, f.minKey)
      val from = if (i >= 0) i else -i - 1
      from < hashes.length && hashes(from) <= f.maxKey
    }
    val base = TxLog.readFiles(spark, index, files)
    val pushed =
      if (hashes.length <= 1000)
        base.filter(col("term_hash").isin(hashes.map(Long.box).toSeq: _*))
      else base
    pushed.join(broadcast(t.select("term")), Seq("term"), "left_semi")
  }

  /** Remove the postings of deleted documents — churn-sized merge-on-
    * read deletes keyed on doc_id (the caller supplies the deleted keys;
    * the right-to-be-forgotten flow has them in hand). Stats shrink by
    * the removed docs' contribution so avgdl stays honest. */
  /** The stats contribution (docs, total length) the given keys STILL
    * hold in the live postings — what [[pruneDeleted]] (and
    * [[graft.ops.Forget]]'s post-transaction catch-up) must shrink the
    * 1-row stats table by. Zero for already-deleted keys, so both
    * callers stay idempotent under redelivery. */
  def deletedContribution(spark: SparkSession, index: Path,
      deletedKeys: DataFrame, idCol: String = "doc_id"): (Long, Long) = {
    val keys = deletedKeys.select(col(idCol).cast("long").as("doc_id"))
    val gone = TxLog.readAt(spark, index)
      .join(broadcast(keys), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(first(col("dl")).as("dl"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("len")).head
    (gone.getLong(0), gone.getLong(1))
  }

  /** Settle the derived scalars after `nGone` docs (carrying `lenGone`
    * total tokens) left the index by an EXTERNAL delete (Forget's
    * transaction): stats shrink so avgdl stays honest, and the
    * dictionary's staleness counter advances so the bounded search
    * modes recount live dfs until maintain folds the dictionary. */
  def noteDeleted(spark: SparkSession, index: Path, nGone: Long,
      lenGone: Long): Unit = {
    if (nGone == 0) return
    val s = scalarsOf(spark, statsDir(index), Seq("n_docs", "total_len"))
    writeStats(spark, index, (s(0) - nGone, s(1) - lenGone))
    if (TxLog.versions(tstatsDir(index)).nonEmpty) {
      val (n, at) = readTstatsMeta(spark, index)
      writeTstatsMeta(spark, index, (n + nGone, at))
    }
  }

  def pruneDeleted(spark: SparkSession, index: Path, deletedKeys: DataFrame,
      idCol: String = "doc_id"): Long = Jobs.labeled(spark, "text pruneDeleted") {
    import spark.implicits._
    val keys = deletedKeys.select(col(idCol).cast("long").as("doc_id"))
    // the removed docs' length contribution, BEFORE the postings go
    val (nGone, lenGone) = deletedContribution(spark, index, deletedKeys, idCol)
    // the positional sibling (if built) carries the same documents'
    // occurrence rows — a phrase query must not resurrect deleted docs.
    // Pruned BEFORE the empty-freq early return: a crash between the two
    // deletes redelivers with nGone == 0, and the sibling must still
    // catch up (re-deleting already-DV'd keys is a cheap no-op).
    if (TxLog.versions(posDir(index)).nonEmpty && !keys.isEmpty)
      TxLog.deleteMor(spark, posDir(index), keys, "doc_id"): Unit
    if (nGone == 0) return 0L
    val (v, _, _, _) = TxLog.deleteMor(spark, index, keys, "doc_id")
    // stats shrink + dictionary stale-HIGH marker (the bounded search
    // modes recount live dfs until maintain folds the dictionary)
    noteDeleted(spark, index, nGone, lenGone)
    v
  }

  /** Stored (tf, dl) pairs per dictionary slice — enough for any
    * serving k the gates use; more pairs only tighten θ̂, never
    * correctness (any SUBSET of a list's postings lower-bounds its
    * k-th best partial). */
  private val TopPairs = 32

  /** The per-(term, SLICE) dictionary rows behind the bounded search
    * modes: document frequency, the dl-independent score ceiling, the
    * slice's top (tf, dl) pairs (packed dl<<20 | min(tf, 2^20-1) — the
    * tf cap only LOWERS a recomputed partial, so a driver-side θ̂ from
    * stored pairs stays a safe lower bound), and the postings commit
    * this slice indexed (`slice_ver`, -1 = unbound). Pairs ride the
    * bounded [[graft.functions.TopKAgg]] heap — O(TopPairs) memory per
    * term with map-side combine, never a collect_list of a hot term's
    * whole posting list. */
  private def tstatsDelta(spark: SparkSession, posts: DataFrame,
      sliceVer: Long): DataFrame = {
    graft.functions.VectorFunctions.registerAll(spark)
    // TopKAgg is a TypedImperativeAggregate, so this plan runs as
    // ObjectHashAggregate — whose default sort-based fallback triggers
    // at 128 in-memory groups, far under any real vocabulary, turning
    // the dictionary build into a full sort of the increment's
    // postings. Each group buffer is a k-bounded heap (~0.5 KB), so a
    // 128k-group hash map is ~64 MB per task — cheap against the sort
    // it avoids (the tix02/03 build-cost fix, round-15 verdict #6).
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    posts.groupBy(col("term_hash"), col("term"))
      .agg(count(lit(1)).as("df"),
        max(col("tf").cast("double") /
          (col("tf").cast("double") + lit(1.2) * (lit(1.0) - 0.75))).as("tf_bound"),
        expr(("topk_pairs(cast(tf as double) / (cast(tf as double) + 0.3 " +
          "+ 0.9 * cast(dl as double) / 64.0), " +
          s"shiftleft(dl, 20) + least(tf, 1048575), $TopPairs)")).as("top_pairs"))
      .withColumn("slice_ver", lit(sliceVer))
  }

  /** One-time in-place schema evolution for a pre-round-16 dictionary:
    * the new columns land as NULLs (unbound slice, no stored pairs), so
    * block-max serving degrades gracefully (hash-range reads, θ̂ via a
    * live-postings job) until [[maintain]] rebuilds exact values. */
  private def upgradeTstatsSchema(spark: SparkSession, index: Path): Unit = {
    val t = tstatsDir(index)
    if (TxLog.versions(t).isEmpty) return
    val have = TxLog.tableSchema(t).map(_.fieldNames.toSet).getOrElse(Set.empty)
    if (!have("top_pairs"))
      TxLog.addColumn(t, "top_pairs", graft.functions.TopKAgg.resultType): Unit
    if (!have("slice_ver"))
      TxLog.addColumn(t, "slice_ver", org.apache.spark.sql.types.LongType): Unit
  }

  /** 1-row scalar sidecars (_stats, _tstats_meta) read from DRIVER
    * metadata alone: the single live 1-row file's per-column footer
    * [min,max] IS the value (min == max), so the serving hot path pays
    * zero Spark jobs for them. Any other shape (multi-file, DV'd,
    * missing column stats) falls back to the Spark read. */
  private def scalarsOf(spark: SparkSession, table: Path, names: Seq[String]): Seq[Long] = {
    val snap = TxLog.snapshotAt(table)
    if (snap.files.size == 1 && snap.files.head.rows == 1 &&
        snap.files.head.dv.isEmpty) {
      val c = snap.files.head.cols
      if (names.forall(n => c.get(n).exists(p => p._1 == p._2)))
        return names.map(n => c(n)._1)
    }
    val r = TxLog.readAt(spark, table).head
    names.map(n => r.getLong(r.fieldIndex(n)))
  }

  private def readTstatsMeta(spark: SparkSession, index: Path): (Long, Long) =
    if (TxLog.versions(tstatsMetaDir(index)).isEmpty) (0L, 0L)
    else {
      val s = scalarsOf(spark, tstatsMetaDir(index), Seq("n_deleted", "refreshed_at"))
      (s(0), s(1))
    }

  private def writeTstatsMeta(spark: SparkSession, index: Path, v: (Long, Long)): Unit = {
    import spark.implicits._
    val df = Seq(v).toDF("n_deleted", "refreshed_at")
    if (TxLog.versions(tstatsMetaDir(index)).isEmpty)
      TxLog.append(spark, df, tstatsMetaDir(index), "n_deleted"): Unit
    else TxLog.overwrite(spark, df, tstatsMetaDir(index), "n_deleted"): Unit
  }

  /** What [[maintain]] did: docs newly indexed, postings files and DV
    * sidecars before/after the re-cluster, dead files reclaimed. */
  final case class MaintainReport(docsIndexed: Long, filesBefore: Long,
    filesAfter: Long, dvsBefore: Long, dvsAfter: Long, reclaimed: Long)

  /** Index LIFECYCLE maintenance — the bloom index's vacuum discipline
    * applied to the postings. A long-lived index degrades two ways:
    * every incremental [[ensureIndexed]] appends its OWN clustered
    * file-set (term_hash ranges overlap across commits, so a term
    * lookup pays ~one file per increment), and [[pruneDeleted]] leaves
    * DV sidecars whose anti-join every read replays. This folds both
    * back to the freshly-built shape:
    *   1. index corpus files not yet in the watermark (meta table
    *      supplies the id/text binding; the doc_id anti-join keeps a
    *      compaction-rewritten corpus from doubling postings);
    *   2. re-cluster ALL postings into nClusters range-DISJOINT files
    *      with DVs folded in (one distributed compactClustered job,
    *      one atomic commit — readers never block), restoring the
    *      one-file-per-term seek;
    *   3. compact the per-increment watermark appends to one file;
    *   4. vacuum dead versions of every sibling table.
    * Serving through the rewrite is identical by construction (same
    * rows, new layout) — TextIndexSpec pins it, gate tix05 proves the
    * per-term file count returns to the clustered bound. */
  def maintain(spark: SparkSession, corpus: Path, index: Path,
      vacuumKeep: Int = 1, vacuumMinAgeMs: Long = 0L): MaintainReport = {
    val (idCol, textCol, nClusters) = readMeta(spark, index).getOrElse {
      if (TxLog.versions(index).isEmpty) ("doc_id", "text", 8) // fresh index: maintain IS the build
      else throw new IllegalStateException(
        s"text index at $index predates the _meta sidecar — its id/text binding is " +
          "unknown and maintenance will not guess one. Run TextIndex.ensureIndexed " +
          "once with the original idCol/textCol/nClusters to backfill _meta, then maintain.")
    }
    val indexedNew = ensureIndexed(spark, corpus, index, idCol, textCol, nClusters)
    val snap0 = TxLog.snapshotAt(index)
    val dvs0 = snap0.files.count(_.dv.isDefined).toLong
    if (snap0.files.nonEmpty)
      TxLog.compactClustered(spark, index, "term_hash",
        clusterBucket(nClusters), nClusters): Unit
    if (TxLog.snapshotAt(filesDir(index)).files.size > 1)
      TxLog.compact(spark, filesDir(index), "file_name", nParts = 1): Unit
    // the _tstats dictionary: increments appended log-structured slices
    // and pruneDeleted left its df counts stale-high — rebuild it EXACT
    // from the live (DV-folded) postings, restore the range clustering,
    // and reset the staleness counter so MaxScore's fast path reopens
    if (TxLog.versions(tstatsDir(index)).nonEmpty) {
      upgradeTstatsSchema(spark, index)
      // one slice, bound to the freshly-compacted postings commit —
      // after this every term's unit resolves to exactly its one
      // clustered file. ONE clustered overwrite: the old overwrite +
      // compactClustered pair rewrote the dictionary twice for the
      // same final layout.
      TxLog.overwriteClustered(spark,
        tstatsDelta(spark, TxLog.readAt(spark, index), TxLog.latestVersion(index)),
        tstatsDir(index), "term_hash", clusterBucket(nClusters), nClusters): Unit
      val (n, _) = readTstatsMeta(spark, index)
      writeTstatsMeta(spark, index, (n, n))
    }
    // the positional sibling (if built) degrades the same two ways —
    // fold its increments and watermark back too
    if (TxLog.versions(posDir(index)).nonEmpty) {
      ensurePositional(spark, corpus, index, idCol, textCol, nClusters): Unit
      if (TxLog.snapshotAt(posDir(index)).files.nonEmpty)
        TxLog.compactClustered(spark, posDir(index), "term_hash",
          clusterBucket(nClusters), nClusters): Unit
      if (TxLog.snapshotAt(posFilesDir(index)).files.size > 1)
        TxLog.compact(spark, posFilesDir(index), "file_name", nParts = 1): Unit
    }
    val reclaimed = Seq(index, statsDir(index), filesDir(index), metaDir(index),
        tstatsDir(index), tstatsMetaDir(index), posDir(index), posFilesDir(index))
      .map { t =>
        if (TxLog.versions(t).isEmpty) 0
        else TxLog.vacuum(t, keepVersions = math.max(1, vacuumKeep),
          minAgeMs = vacuumMinAgeMs).size
      }.sum.toLong
    val snap1 = TxLog.snapshotAt(index)
    MaintainReport(indexedNew, snap0.files.size.toLong, snap1.files.size.toLong,
      dvs0, snap1.files.count(_.dv.isDefined).toLong, reclaimed)
  }

  /** One dictionary slice's facts for one term (the [[dictCache]]
    * payload). */
  private final case class DictRow(term: String, df: Long, bound: Double,
      pairs: Seq[(Long, Long)], ver: Long)

  /** Per-JVM dictionary cache, keyed "<tstats path>@<version>#<term>" —
    * entries are immutable by construction (a published commit never
    * changes), cleared wholesale past 64k terms. */
  private val dictCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DictRow]]()

  /** The term's xxhash64 (seed 42, Spark's SQL default) computed ON THE
    * DRIVER — bit-identical to the `xxhash64(term)` column the postings
    * carry (TextIndexSpec pins it), without paying one Spark job per
    * query term just to hash a constant. */
  private[ops] def termHash(term: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)

  /** Files a single term's index scan must touch — the pruning-power
    * audit, decided from driver metadata alone ([[TxLog.pruneFiles]] on
    * the designated term_hash stats), no data read. */
  def filesForTerm(spark: SparkSession, index: Path, term: String): Int = {
    val h = termHash(term)
    TxLog.pruneFiles(TxLog.snapshotAt(index), h, h).size
  }

  private def writeStats(spark: SparkSession, index: Path, v: (Long, Long)): Unit = {
    import spark.implicits._
    val df = Seq(v).toDF("n_docs", "total_len")
    if (TxLog.versions(statsDir(index)).isEmpty)
      TxLog.append(spark, df, statsDir(index), "n_docs"): Unit
    else TxLog.overwrite(spark, df, statsDir(index), "n_docs"): Unit
  }
}
