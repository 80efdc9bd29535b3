package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persisted inverted-text-index mechanics (tix01/tix02 gate the BM25
  * ranking against DuckDB): the serving plan never touches the corpus,
  * maintenance is idempotent and compaction-proof, deletes prune, and
  * the incremental build is indistinguishable from a rebuild. */
class TextIndexSpec extends SparkSpec {

  private def corpusDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("text",
      concat(lit("alpha beta"),
        when(col("doc_id") % 3 === 0, lit(" gamma gamma")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" rareword")).otherwise(lit(""))))
  }

  test("serving reads ONLY the index tables; the corpus never enters the plan") {
    val base = Files.createTempDirectory("graft_tix")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 99L), corpus, "doc_id", nParts = 2)
    assert(TextIndex.ensureIndexed(spark, corpus, index) == 100L)
    val res = TextIndex.searchBm25(spark, index, Seq("gamma", "rareword"), 10)
    val files = res.inputFiles.toSeq
    assert(files.nonEmpty)
    assert(files.forall(f => !f.contains("/corpus/")),
      s"corpus leaked into the serving plan: $files")
    // and the ranking is sane: docs with both terms outrank gamma-only
    val top = res.collect().map(_.getLong(0))
    assert(top.nonEmpty && top.head % 7 == 0 && top.head % 3 == 0)
  }

  test("posting-list reads PRUNE: a term's search scans fewer index files than the index has") {
    val base = Files.createTempDirectory("graft_tix_prune")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    import spark.implicits._
    // a real-vocabulary shape (50 distinct terms), so the range-monotone
    // term_hash clustering has an axis to spread over
    val d = (0L to 499L).toDF("doc_id").withColumn("text",
      concat(lit("alpha w"), (col("doc_id") % 50).cast("string")))
    TxLog.append(spark, d, corpus, "doc_id", nParts = 4)
    TextIndex.ensureIndexed(spark, corpus, index, nClusters = 8): Unit
    val indexFiles = TxLog.snapshotAt(index).files.size
    assert(indexFiles >= 4, s"want a multi-file index, got $indexFiles")
    val scanned = TextIndex.searchBm25(spark, index, Seq("w7"), 5)
      .inputFiles.count(_.contains("/ix/"))
    assert(scanned < indexFiles,
      s"term_hash clustering should prune: scanned $scanned of $indexFiles")
  }

  test("ensureIndexed is idempotent and survives corpus compaction without doubling postings") {
    val base = Files.createTempDirectory("graft_tix2")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 49L), corpus, "doc_id", nParts = 2)
    assert(TextIndex.ensureIndexed(spark, corpus, index) == 50L)
    assert(TextIndex.ensureIndexed(spark, corpus, index) == 0L)
    val before = TxLog.readAt(spark, index).count()
    // compaction rewrites every corpus file under new names — the
    // watermark sees "new" files, the doc_id anti-join keeps postings single
    TxLog.compact(spark, corpus, "doc_id")
    assert(TextIndex.ensureIndexed(spark, corpus, index) == 0L)
    assert(TxLog.readAt(spark, index).count() == before)
  }

  test("incremental build equals rebuild, postings multiset and stats both") {
    val base = Files.createTempDirectory("graft_tix3")
    val c1 = base.resolve("c1"); val i1 = base.resolve("i1")
    val c2 = base.resolve("c2"); val i2 = base.resolve("i2")
    // incremental: two arrivals
    TxLog.append(spark, corpusDf(0L to 39L), c1, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, c1, i1): Unit
    TxLog.append(spark, corpusDf(40L to 79L), c1, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, c1, i1): Unit
    // rebuild: one arrival
    TxLog.append(spark, corpusDf(0L to 79L), c2, "doc_id", nParts = 4)
    TextIndex.ensureIndexed(spark, c2, i2): Unit
    val a = TxLog.readAt(spark, i1).select("term", "doc_id", "tf", "dl")
    val b = TxLog.readAt(spark, i2).select("term", "doc_id", "tf", "dl")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "incremental postings differ from rebuild")
    val sa = TxLog.readAt(spark, base.resolve("i1_stats")).head
    val sb = TxLog.readAt(spark, base.resolve("i2_stats")).head
    assert(sa.getLong(0) == sb.getLong(0) && sa.getLong(1) == sb.getLong(1))
  }

  test("maintain folds incremental file-sets back to the clustered per-term bound, serving unchanged") {
    val base = Files.createTempDirectory("graft_tix5")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    // 1 build + 4 increments: every commit holds alpha/beta docs, so a
    // term's postings land in one file PER COMMIT — 5 overlapping sets
    (0L until 5L).foreach { i =>
      TxLog.append(spark, corpusDf((i * 20L) until (i * 20L + 20L)), corpus,
        "doc_id", nParts = 1)
      TextIndex.ensureIndexed(spark, corpus, index): Unit
    }
    val before = TextIndex.filesForTerm(spark, index, "alpha")
    assert(before == 5, s"expected one file per increment, got $before")
    val servedBefore = TextIndex.searchBm25(spark, index, Seq("gamma", "rareword"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rep = TextIndex.maintain(spark, corpus, index)
    assert(rep.docsIndexed == 0L)
    val after = TextIndex.filesForTerm(spark, index, "alpha")
    assert(after == 1, s"re-cluster should restore the one-file seek, got $after")
    val servedAfter = TextIndex.searchBm25(spark, index, Seq("gamma", "rareword"), 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(servedAfter == servedBefore, "maintenance changed the ranking")
    // the per-increment watermark appends folded to one file
    assert(TxLog.snapshotAt(base.resolve("ix_files")).files.size == 1)
  }

  test("maintain folds pruneDeleted's DV sidecars and indexes corpus files that arrived since") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix6")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 59L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.deleteMor(spark, corpus, Seq(21L, 42L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(21L, 42L).toDF("doc_id")): Unit
    assert(TxLog.snapshotAt(index).files.exists(_.dv.isDefined))
    // new corpus files since the last ensureIndexed: maintain indexes them
    TxLog.append(spark, corpusDf(60L to 79L), corpus, "doc_id", nParts = 1)
    val rep = TextIndex.maintain(spark, corpus, index)
    assert(rep.docsIndexed == 20L)
    assert(rep.dvsBefore >= 1L && rep.dvsAfter == 0L,
      s"DVs should fold: before=${rep.dvsBefore} after=${rep.dvsAfter}")
    val ids = TextIndex.searchBm25(spark, index, Seq("rareword"), 80)
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(21L) && !ids.contains(42L))
    assert(ids.contains(70L) && ids.contains(63L)) // 70 %7==0, 63 %7==0
    val st = TxLog.readAt(spark, base.resolve("ix_stats")).head
    assert(st.getLong(0) == 78L) // 60 - 2 deleted + 20 new
  }

  test("positional index: phrase alignment, incremental build, overlapping phrases, maintain re-clusters") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix8")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    val mk = (id: Long, text: String) => Seq((id, text)).toDF("doc_id", "text")
    TxLog.append(spark, mk(1L, "a b c a b c x"), corpus, "doc_id", nParts = 1)
    TxLog.append(spark, mk(2L, "b c a b"), corpus, "doc_id", nParts = 1)
    assert(TextIndex.ensurePositional(spark, corpus, index) == 2L)
    // doc 1 holds "a b c" at starts 0 and 3; doc 2 holds none ("a b" only)
    val r1 = TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r1 == Seq((1L, 2L)))
    // cross-boundary phrase: "b c a b" spans the repeat in doc 1
    // (b1 c2 a3 b4) and is all of doc 2
    assert(TextIndex.searchPhrase(spark, index, "b c a b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 1L)))
    // incremental arrival + redelivery idempotence
    TxLog.append(spark, mk(3L, "z a b c"), corpus, "doc_id", nParts = 1)
    assert(TextIndex.ensurePositional(spark, corpus, index) == 1L)
    assert(TextIndex.ensurePositional(spark, corpus, index) == 0L)
    val r2 = TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r2 == Seq((1L, 2L), (3L, 1L)))
    // maintain folds the positional increments too; serving unchanged.
    // (the frequency index must exist for maintain's meta/read path)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    val filesBefore = TxLog.snapshotAt(base.resolve("ix_pos")).files.size
    TextIndex.maintain(spark, corpus, index): Unit
    val filesAfter = TxLog.snapshotAt(base.resolve("ix_pos")).files.size
    assert(filesAfter <= filesBefore)
    assert(TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == r2)
  }

  test("pruneDeleted reaches the positional sibling: a phrase query cannot resurrect a deleted doc") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix9p")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text"),
      corpus, "doc_id", nParts = 1)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TextIndex.ensurePositional(spark, corpus, index): Unit
    assert(TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    TxLog.deleteMor(spark, corpus, Seq(1L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(1L).toDF("doc_id")): Unit
    assert(TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // redelivery after a hypothetical crash between the two deletes:
    // the replay must keep both tables consistent and change nothing
    TextIndex.pruneDeleted(spark, index, Seq(1L).toDF("doc_id")): Unit
    assert(TextIndex.searchPhrase(spark, index, "a b c")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(TextIndex.searchBm25(spark, index, Seq("a"), 10)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("pruneDeleted is idempotent under redelivery: a replayed key set never double-shrinks the stats") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix7")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 29L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    assert(TextIndex.pruneDeleted(spark, index, Seq(7L, 14L).toDF("doc_id")) > 0L)
    val st1 = TxLog.readAt(spark, base.resolve("ix_stats")).head
    // the crash-redelivery case a CDF-driven pruner hits: same batch again
    assert(TextIndex.pruneDeleted(spark, index, Seq(7L, 14L).toDF("doc_id")) == 0L)
    val st2 = TxLog.readAt(spark, base.resolve("ix_stats")).head
    assert(st1.getLong(0) == st2.getLong(0) && st1.getLong(1) == st2.getLong(1))
    assert(st1.getLong(0) == 28L)
  }

  test("pruneDeleted removes a document from the ranking and shrinks the stats") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix4")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 29L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    val before = TextIndex.searchBm25(spark, index, Seq("rareword"), 30)
      .collect().map(_.getLong(0)).toSet
    assert(before.contains(21L)) // 21 % 7 == 0
    // the GDPR flow: MOR-delete in the corpus, prune the index with the keys
    TxLog.deleteMor(spark, corpus, Seq(21L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(21L).toDF("doc_id")): Unit
    val after = TextIndex.searchBm25(spark, index, Seq("rareword"), 30)
      .collect().map(_.getLong(0)).toSet
    assert(after == before - 21L)
    val st = TxLog.readAt(spark, base.resolve("ix_stats")).head
    assert(st.getLong(0) == 29L)
  }

  test("binding contracts: meta mismatch refused, legacy index refuses maintain, backfill restores it") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix5")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark,
      corpusDf(0L to 9L).withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body"),
      corpus, "id", nParts = 1)
    TextIndex.ensureIndexed(spark, corpus, index, idCol = "id", textCol = "body"): Unit
    // re-ingesting under a different binding must refuse, not corrupt
    intercept[IllegalArgumentException] {
      TextIndex.ensureIndexed(spark, corpus, index) // defaults != (id, body, 8)
    }
    // a legacy index (no _meta sidecar) must refuse maintenance outright
    val metaLog = base.resolve("ix_meta")
    val legacyMeta = base.resolve("ix_meta_hidden")
    Files.move(metaLog, legacyMeta)
    val ex = intercept[IllegalStateException] {
      TextIndex.maintain(spark, corpus, index)
    }
    assert(ex.getMessage.contains("_meta"))
    // backfill route: one explicit ensureIndexed with the original args
    Files.move(legacyMeta, metaLog)
    TxLog.append(spark, corpusDf(10L to 14L)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("text", "body"),
      corpus, "id", nParts = 1)
    val rep = TextIndex.maintain(spark, corpus, index)
    assert(rep.docsIndexed == 5L)
    assert(TextIndex.searchBm25(spark, index, Seq("rareword"), 30)
      .collect().map(_.getLong(0)).toSet == Set(0L, 7L, 14L))
  }

  test("MaxScore: skips the common list, ranking EXACTLY equals full scoring") {
    val base = Files.createTempDirectory("graft_tix7")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    // two increments so the dictionary is multi-slice (sum-at-read path)
    TxLog.append(spark, corpusDf(0L to 49L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.append(spark, corpusDf(50L to 99L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    val terms = Seq("rareword", "alpha") // rare high-impact vs universal low-impact
    val full = TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq
    val (pruned, rep) = TextIndex.searchBm25MaxScore(spark, index, terms, 5)
    assert(!rep.fellBack)
    assert(rep.essential == Seq("rareword") && rep.skipped == Seq("alpha"),
      s"expected alpha non-essential, got $rep")
    assert(rep.postingsEssential < rep.postingsTotal)
    assert(pruned.collect().toSeq == full)
    // a term the corpus never saw: both modes agree (and no crash)
    val (ghost, grep) = TextIndex.searchBm25MaxScore(spark, index, Seq("zzz_unseen"), 5)
    assert(ghost.collect().isEmpty && !grep.fellBack)
  }

  test("maintain rebuilds the _tstats dictionary EXACTLY from the live postings") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix9")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    // increments + deletes leave log-structured slices + stale-high df
    TxLog.append(spark, corpusDf(0L to 59L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.append(spark, corpusDf(60L to 99L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.deleteMor(spark, corpus, Seq(21L, 63L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(21L, 63L).toDF("doc_id")): Unit
    TextIndex.maintain(spark, corpus, index): Unit
    // the dictionary must equal an independent recompute over the live
    // postings — df exact (deletes folded), bound exact, one row per term
    val recomputed = TxLog.readAt(spark, index)
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        max(col("tf").cast("double") / (col("tf").cast("double") + 0.3)).as("b"))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val stored = TxLog.readAt(spark, base.resolve("ix_tstats"))
      .groupBy("term")
      .agg(sum(col("df")).as("df"), max(col("tf_bound")).as("b"))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(stored.toSeq == recomputed.toSeq)
    // ...and post-maintain the table IS one row per term (folded exact)
    val nRows = TxLog.readAt(spark, base.resolve("ix_tstats")).count()
    assert(nRows == recomputed.length.toLong)
  }

  test("MaxScore: deletes force a live-df recount, ranking still exact, pruning kept") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix8")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 99L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.deleteMor(spark, corpus, Seq(7L, 14L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(7L, 14L).toDF("doc_id")): Unit
    val terms = Seq("rareword", "alpha")
    val (r1, rep1) = TextIndex.searchBm25MaxScore(spark, index, terms, 5)
    assert(!rep1.fellBack && rep1.dfRecounted,
      "stale-high df must recount live dfs, not serve stored bounds")
    assert(rep1.skipped.nonEmpty, "pruning survives the stale-dictionary path")
    // 7 and 14 are rareword docs (%7==0): the recounted df must be the
    // LIVE one, so the exact ranking over survivors still matches
    assert(r1.collect().toSeq == TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq)
    TextIndex.maintain(spark, corpus, index): Unit
    val (r2, rep2) = TextIndex.searchBm25MaxScore(spark, index, terms, 5)
    assert(!rep2.fellBack && !rep2.dfRecounted && rep2.skipped.nonEmpty)
    assert(r2.collect().toSeq == TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq)
  }

  test("a pre-dictionary index upgraded mid-life gets a COMPLETE dictionary") {
    val base = Files.createTempDirectory("graft_tix10")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 49L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    // simulate an index built by a pre-_tstats binary
    TxLog.deleteTree(base.resolve("ix_tstats"))
    TxLog.deleteTree(base.resolve("ix_tstats_meta"))
    val (legacy, legacyRep) = TextIndex.searchBm25MaxScore(
      spark, index, Seq("rareword", "alpha"), 5)
    assert(legacyRep.fellBack) // no dictionary at all: exact full scoring
    assert(legacy.collect().toSeq ==
      TextIndex.searchBm25(spark, index, Seq("rareword", "alpha"), 5).collect().toSeq)
    // the upgrading increment must cover the OLD postings too — a
    // delta-only dictionary would misrank every query touching them
    TxLog.append(spark, corpusDf(50L to 79L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    val (pruned, rep) = TextIndex.searchBm25MaxScore(
      spark, index, Seq("rareword", "alpha"), 5)
    assert(!rep.fellBack && rep.skipped.nonEmpty)
    assert(pruned.collect().toSeq ==
      TextIndex.searchBm25(spark, index, Seq("rareword", "alpha"), 5).collect().toSeq)
  }

  test("empty query-term lists refuse with a clear message in both search modes") {
    val base = Files.createTempDirectory("graft_tix6")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 4L), corpus, "doc_id", nParts = 1)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    intercept[IllegalArgumentException](TextIndex.searchBm25(spark, index, Nil, 5))
    intercept[IllegalArgumentException](TextIndex.searchBm25All(spark, index, Nil, 5))
  }

  test("block-max: multi-increment index, unit-level pruning, file reads bounded, ranking exact") {
    val base = Files.createTempDirectory("graft_tix10")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    // three id-RANGE increments: each slice's files carry disjoint
    // doc_id footer ranges, the layout the candidate-span prune needs
    Seq(0L to 39L, 40L to 79L, 80L to 119L).foreach { r =>
      TxLog.append(spark, corpusDf(r), corpus, "doc_id", nParts = 1)
      TextIndex.ensureIndexed(spark, corpus, index): Unit
    }
    val terms = Seq("rareword", "alpha")
    val full = TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq
    val (pruned, rep) = TextIndex.searchBm25BlockMax(spark, index, terms, 5)
    assert(!rep.fellBack && rep.thetaFromDict && !rep.dfRecounted)
    assert(rep.unitsEssential < rep.unitsTotal, s"no unit pruned: $rep")
    assert(rep.filesRead <= rep.filesFull && rep.filesRead > 0, s"file accounting off: $rep")
    assert(pruned.collect().toSeq == full)
    // ghost term: agreement and no crash
    val (ghost, grep2) = TextIndex.searchBm25BlockMax(spark, index, Seq("zzz_unseen"), 5)
    assert(ghost.collect().isEmpty && !grep2.fellBack)
  }

  test("block-max: deletes force the safe path (live recount + θ̂ from live postings), still exact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_tix11")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 99L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    TxLog.deleteMor(spark, corpus, Seq(7L, 14L).toDF("doc_id"), "doc_id"): Unit
    TextIndex.pruneDeleted(spark, index, Seq(7L, 14L).toDF("doc_id")): Unit
    val terms = Seq("rareword", "alpha")
    val (r1, rep1) = TextIndex.searchBm25BlockMax(spark, index, terms, 5)
    assert(!rep1.fellBack && rep1.dfRecounted && !rep1.thetaFromDict,
      "stored pairs may name deleted docs; θ̂ must come from live postings")
    assert(r1.collect().toSeq == TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq)
    // maintain folds DVs + rebuilds the dictionary: fast path reopens,
    // every unit binds to the one compacted commit
    TextIndex.maintain(spark, corpus, index): Unit
    val (r2, rep2) = TextIndex.searchBm25BlockMax(spark, index, terms, 5)
    assert(!rep2.fellBack && !rep2.dfRecounted && rep2.thetaFromDict)
    assert(rep2.filesRead <= rep2.filesFull)
    assert(r2.collect().toSeq == TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq)
  }

  test("block-max: a pre-slice_ver dictionary falls back to exact full scoring") {
    val base = Files.createTempDirectory("graft_tix12")
    val corpus = base.resolve("corpus")
    val index = base.resolve("ix")
    TxLog.append(spark, corpusDf(0L to 59L), corpus, "doc_id", nParts = 2)
    TextIndex.ensureIndexed(spark, corpus, index): Unit
    // simulate a legacy dictionary: rewrite _tstats with files that
    // LACK the new columns (what a pre-round-16 build wrote). The log
    // schema keeps listing them (evolution is append-only), so the
    // merge-on-read scan serves them as NULLs — exactly the
    // upgradeTstatsSchema shape — and block-max must degrade safely:
    // unbound units → hash-range reads, no stored pairs → θ̂ = -inf →
    // everything essential = exact full scoring, never a wrong answer.
    val t = base.resolve("ix_tstats")
    TxLog.overwrite(spark,
      TxLog.readAt(spark, t).drop("top_pairs", "slice_ver"),
      t, "term_hash", nParts = 1): Unit
    val terms = Seq("rareword", "alpha")
    val (r, rep) = TextIndex.searchBm25BlockMax(spark, index, terms, 5)
    assert(r.collect().toSeq ==
      TextIndex.searchBm25(spark, index, terms, 5).collect().toSeq)
    assert(!rep.fellBack, "null bindings degrade to hash-range reads, not a refusal")
  }

  test("driver-side termHash is bit-identical to the SQL xxhash64 the postings carry") {
    import spark.implicits._
    val terms = Seq("spark", "rareword", "日本語", "", "a b", " x")
    val sql = terms.toDF("t").selectExpr("t", "xxhash64(t) AS h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach(t => assert(TextIndex.termHash(t) == sql(t), s"hash mismatch for '$t'"))
  }
}
