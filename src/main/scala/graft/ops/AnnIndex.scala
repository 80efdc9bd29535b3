package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PERSISTED ANN (IVF) index as a self-maintaining lake artifact —
  * the TextIndex lifecycle applied to vectors (round-14 verdict #1).
  *
  * Layout (all ordinary TxLog tables, so every piece is versioned,
  * time-travelable, and streamable):
  *   - `<ix>`        assignments `(corpus cols..., cent_id)`, written
  *                   ONE FILE PER INVERTED LIST (clusterCol = cent_id):
  *                   footer [min,max] on cent_id IS the list boundary,
  *                   so a probe's candidate read prunes to exactly the
  *                   probed lists — FAISS's per-list storage re-expressed
  *                   as parquet + stats instead of a custom format.
  *   - `<ix>_cent`   the trained coarse quantizer `(cent_id, cent_emb)`,
  *                   corpus-scaled C, seeded + one integer-quantized
  *                   Lloyd update (bit-deterministic: exact int64 sums,
  *                   IEEE means — graft.ops.Clustering). Trained ONCE on
  *                   the creating batch; a trained artifact never
  *                   invalidates, increments assign against it.
  *   - `<ix>_files`  corpus watermark (files already assigned).
  *   - `<ix>_meta`   the binding `(id_col, emb_col, n_clusters)` — same
  *                   contract as TextIndex: maintenance REFUSES a legacy
  *                   index without it rather than guess and corrupt.
  *
  * Degradation + cure (the tix05 disease, vector edition): each
  * incremental [[ensureIndexed]] appends its own per-list file-set, so
  * after N increments a probe pays up to N files per list, and
  * merge-on-read deletes leave DV sidecars every read must anti-join.
  * [[maintain]] re-clusters ALL assignments back to one file per list
  * with DVs folded (one distributed compactClustered job, one atomic
  * commit — readers never block), folds the watermark, and vacuums dead
  * versions. Serving through the rewrite is identical by construction
  * (same rows, new layout) — gate sim14 pins both the equality and the
  * files-per-probe bound; AnnIndexSpec pins the contracts.
  *
  * The reference (a parser-to-sink shuttle, /root/reference/src/domain/ports.rs)
  * has no vector surface; the design here follows the published IVF
  * literature (Jégou et al., TPAMI 2011) re-expressed Spark-first.
  */
object AnnIndex {

  /** sim07's corpus-scaled target list size (125 vectors/list). */
  private val TargetListSize = 125

  private def centDir(index: Path): Path = index.resolveSibling(index.getFileName + "_cent")
  private def filesDir(index: Path): Path = index.resolveSibling(index.getFileName + "_files")
  private def metaDir(index: Path): Path = index.resolveSibling(index.getFileName + "_meta")
  private def cbDir(index: Path): Path = index.resolveSibling(index.getFileName + "_cb")
  private def codesDir(index: Path): Path = index.resolveSibling(index.getFileName + "_codes")
  private def codesMetaDir(index: Path): Path =
    index.resolveSibling(index.getFileName + "_codes_meta")
  private def codesFilesDir(index: Path): Path =
    index.resolveSibling(index.getFileName + "_codes_files")

  /** The PQ sibling's fixed knobs — knn06's contract (64 dims padded,
    * 8 sub-quantizers, 2 Lloyd iterations; the clustered write lays
    * codes out one file per SUB-SPACE — 8 files — with 4-way shuffle
    * parallelism), the codeword count corpus-scaled by the same rule. */
  private val PqDims = 64
  private val PqM = 8
  private val PqIters = 2
  private val PqSubClusters = 4
  private def pqKOf(n: Long): Int =
    math.max(16L, math.min(256L, (n + 31) / 32)).toInt

  private def cosExpr(a: String, b: String): String =
    s"round(vector_cosine($a, $b), 6)"

  /** The index's self-describing binding; None when the _meta sidecar
    * is absent — maintenance must NOT guess (same contract as
    * TextIndex.readMeta, hardened this round). */
  private def readMeta(spark: SparkSession, index: Path): Option[(String, String, Int)] =
    if (TxLog.versions(metaDir(index)).isEmpty) None
    else {
      val r = TxLog.cachedHeadRow(spark, metaDir(index))
      Some((r.getString(r.fieldIndex("id_col")), r.getString(r.fieldIndex("emb_col")),
        r.getInt(r.fieldIndex("n_clusters"))))
    }

  /** Whether the index carries its binding — checked by CALL maintain's
    * sibling pass before driving [[maintain]]. */
  def hasMeta(index: Path): Boolean = TxLog.versions(metaDir(index)).nonEmpty

  /** The id column the index is bound to (None for a meta-less legacy
    * index) — what [[graft.ops.Forget]] keys the atomic erasure on. */
  def boundIdCol(spark: SparkSession, index: Path): Option[String] =
    readMeta(spark, index).map(_._1)

  /** Coarse quantizer: C = max(16, ceil(n/125)) LOWEST-ID seeds BY RANK,
    * one quantized Lloyd update — the exact rule of the sim07/knn06
    * builds (SimilarityQueries.refinedIvfCentroids), parameterized by
    * column. Seeding is by rank, not by the literal value test
    * `id < C`: `CALL ann_index` runs on arbitrary user tables, and a
    * corpus whose ids are offset or sparse would yield few or zero
    * seeds under the value test — an index that silently serves
    * nothing. On dense 0-based ids (the gate corpora) rank-seeding is
    * value-identical to `id < C`, so the sim07/knn06 oracles hold. The
    * C-th-smallest id resolves through TakeOrderedAndProject (a
    * distributed top-C, never a global sort window), so seeding stays
    * executor-parallel at corpus scale. */
  private def trainCentroids(spark: SparkSession, train: DataFrame,
      idCol: String, embCol: String): DataFrame =
      Jobs.labeled(spark, "ann trainCentroids") {
    val q = Clustering.quantize(train, idCol, embCol)
    val cnt = train.count()
    val nC = math.max(16L, (cnt + TargetListSize - 1) / TargetListSize)
    // the seed-id cutoff: max of the C smallest ids (inclusive filter
    // below keeps exactly the C lowest ranks; ids are unique keys)
    val init = q.join(
        broadcast(q.select(col(idCol)).orderBy(col(idCol).asc).limit(
          math.min(nC, Int.MaxValue.toLong).toInt)),
        Seq(idCol), "left_semi")
      .select(col(idCol).as("cid"),
        expr("transform(q, x -> cast(x as double))").as("m"))
    Clustering.recomputeMeans(Clustering.assign(q, init, idCol))
      .select(col("cid").as("cent_id"), col("m").as("cent_emb"))
  }

  /** Nearest-centroid assignment preserving EVERY corpus column (the
    * index row is the corpus row + its home list). Flat broadcast rank
    * below Ann.TwoLevelMinCentroids; coarse→fine sqrt(C) decomposition
    * above it (same crossover as graft.ops.Ann, which owns the
    * fixed-schema variant the sim gates pin). */
  private[ops] def assignAll(vecs: DataFrame, cent: DataFrame,
      idCol: String, embCol: String): DataFrame = {
    val keep = vecs.columns.map(col)
    val c = cent.count()
    if (c <= Ann.TwoLevelMinCentroids) {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("__a_cos").desc, col("cent_id").asc)
      vecs.join(broadcast(cent), lit(true))
        .withColumn("__a_cos", expr(cosExpr(embCol, "cent_emb")))
        .withColumn("__ark", row_number().over(w)).filter(col("__ark") === 1)
        .select(keep :+ col("cent_id"): _*)
    } else {
      val nCoarse = math.ceil(math.sqrt(c.toDouble)).toInt
      val coarse = cent.orderBy(col("cent_id").asc).limit(nCoarse)
        .select(col("cent_id").as("coarse_id"), col("cent_emb").as("coarse_emb"))
        .localCheckpoint(true)
      val wf = Window.partitionBy(col("cent_id"))
        .orderBy(col("__f_cos").desc, col("coarse_id").asc)
      val fineMap = cent.join(broadcast(coarse), lit(true))
        .withColumn("__f_cos", expr(cosExpr("cent_emb", "coarse_emb")))
        .withColumn("__frk", row_number().over(wf)).filter(col("__frk") === 1)
        .select(col("coarse_id"), col("cent_id"), col("cent_emb"))
      val wc = Window.partitionBy(col(idCol))
        .orderBy(col("__c_cos").desc, col("coarse_id").asc)
      val vCoarse = vecs.join(broadcast(coarse), lit(true))
        .withColumn("__c_cos", expr(cosExpr(embCol, "coarse_emb")))
        .withColumn("__crk", row_number().over(wc)).filter(col("__crk") === 1)
        .select(keep :+ col("coarse_id"): _*)
      val wa = Window.partitionBy(col(idCol))
        .orderBy(col("__a_cos").desc, col("cent_id").asc)
      vCoarse.join(fineMap, Seq("coarse_id"))
        .withColumn("__a_cos", expr(cosExpr(embCol, "cent_emb")))
        .withColumn("__ark", row_number().over(wa)).filter(col("__ark") === 1)
        .select(keep :+ col("cent_id"): _*)
    }
  }

  /** Assign every live corpus file not yet in the watermark: the first
    * call TRAINS the coarse quantizer on its batch and IS the build;
    * later calls assign against the persisted centroids (one shared
    * rule, so the index cannot drift) and land as ACID appends, one
    * file per touched list. Idempotent and compaction-proof (id
    * anti-join). Returns newly indexed vector count. */
  def ensureIndexed(spark: SparkSession, corpus: Path, index: Path,
      idCol: String = "vec_id", embCol: String = "embedding",
      nClusters: Int = 8): Long = Jobs.labeled(spark, "ann ensureIndexed") {
    import spark.implicits._
    graft.functions.VectorFunctions.registerAll(spark)
    readMeta(spark, index).foreach { case (i0, e0, n0) =>
      require(i0 == idCol && e0 == embCol && n0 == nClusters,
        s"index at $index is bound to (id=$i0, emb=$e0, clusters=$n0); " +
          s"ensureIndexed called with ($idCol, $embCol, $nClusters)")
    }
    if (TxLog.versions(metaDir(index)).isEmpty)
      TxLog.append(spark,
        Seq((idCol, embCol, nClusters)).toDF("id_col", "emb_col", "n_clusters"),
        metaDir(index), "n_clusters"): Unit
    val snap = TxLog.snapshotAt(corpus)
    val indexed: Set[String] =
      TxLog.cachedStringSet(spark, filesDir(index), "file_name")
    val newFiles = snap.files.filterNot(f => indexed(f.path))
    if (newFiles.isEmpty) return 0L
    val vecs0 = TxLog.readFiles(spark, corpus, newFiles)
    val vecs =
      if (indexed.isEmpty) vecs0
      else vecs0.join(
        TxLog.readAt(spark, index).select(col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    val cent =
      if (TxLog.versions(centDir(index)).isEmpty) {
        val c = trainCentroids(spark, vecs, idCol, embCol).localCheckpoint(true)
        TxLog.append(spark, c, centDir(index), "cent_id", nParts = 1): Unit
        c
      } else TxLog.readAt(spark, centDir(index))
    val assigned = assignAll(vecs, cent, idCol, embCol).localCheckpoint(true)
    val n = assigned.count()
    // fail LOUDLY before the watermark advances: a degenerate build
    // (zero centroids trained, or an assignment that dropped every
    // vector) must not mark the corpus files indexed — that would leave
    // an index permanently serving nothing while claiming coverage
    require(n > 0 || vecs.isEmpty,
      s"ANN index build at $index assigned 0 of the batch's vectors " +
        "(zero trained centroids?) — refusing to advance the watermark")
    if (n > 0)
      TxLog.appendClustered(spark, assigned, index,
        "cent_id", clusterCol = col("cent_id"), nClusters = nClusters): Unit
    TxLog.append(spark,
      newFiles.map(_.path).toDF("file_name"), filesDir(index), "file_name"): Unit
    n
  }

  /** Files a single list's probe must touch — the pruning-power audit,
    * decided from driver metadata alone, no data read. */
  def filesForCent(index: Path, centId: Long): Int =
    TxLog.pruneFilesOn(TxLog.snapshotAt(index), "cent_id", centId, centId).size

  /** Max files-per-probe over every trained list — centroid-count-sized
    * driver work (C stats lookups on one snapshot). After [[maintain]]
    * this is exactly 1: the clustered bound. */
  def maxFilesPerCent(spark: SparkSession, index: Path): Int =
    maxFilesPerCent(spark, index, centDir(index))

  /** Same audit for an ad-hoc assignments/centroids pair (the knn06
    * IVFADC tables, which live outside the sibling convention). */
  def maxFilesPerCent(spark: SparkSession, assignments: Path, centroids: Path): Int = {
    val snap = TxLog.snapshotAt(assignments)
    val cents = TxLog.readAt(spark, centroids)
      .select("cent_id").collect().map(_.getLong(0))
    if (cents.isEmpty) 0
    else cents.map(c => TxLog.pruneFilesOn(snap, "cent_id", c, c).size).max
  }

  /** Whether the index carries the PQ (IVFADC) sibling — what folds
    * its maintenance into [[maintain]] behind the same no-guessing
    * fence as the flat index. */
  def hasPq(index: Path): Boolean = TxLog.versions(codesMetaDir(index)).nonEmpty

  private def readPqMeta(spark: SparkSession, index: Path): Option[(String, String)] =
    if (TxLog.versions(codesMetaDir(index)).isEmpty) None
    else {
      val r = TxLog.cachedHeadRow(spark, codesMetaDir(index))
      Some((r.getString(r.fieldIndex("id_col")), r.getString(r.fieldIndex("emb_col"))))
    }

  /** PQ-encode every live corpus file not yet in the codes watermark —
    * the `pq => true` half of `CALL ann_index` (round-15 verdict #5:
    * the knn06 four-table layout folded under the sibling convention).
    * First call TRAINS the codebook on its batch (Pq.model — rank-
    * seeded k-means per sub-space, knn06's knobs) and IS the build;
    * later calls encode against the persisted codebook (a trained
    * artifact never retrains — old codes stay valid). Watermark diff +
    * id anti-join: idempotent under redelivery and compaction-proof.
    * The assignments half ([[ensureIndexed]]) and this half advance as
    * separate idempotent commits: a crash between them re-converges on
    * the next call (the streaming twin knn07 shows the one-transaction
    * composition; the dq08 audit proves the converged consistency). */
  def ensurePq(spark: SparkSession, corpus: Path, index: Path,
      idCol: String = "vec_id", embCol: String = "embedding"): Long =
      Jobs.labeled(spark, "ann ensurePq") {
    import spark.implicits._
    graft.functions.VectorFunctions.registerAll(spark)
    readPqMeta(spark, index).foreach { case (i0, e0) =>
      require(i0 == idCol && e0 == embCol,
        s"PQ sibling at ${codesDir(index)} is bound to (id=$i0, emb=$e0); " +
          s"ensurePq called with ($idCol, $embCol)")
    }
    if (TxLog.versions(codesMetaDir(index)).isEmpty)
      TxLog.append(spark, Seq((idCol, embCol, PqDims, PqM)).toDF(
        "id_col", "emb_col", "dims", "m"), codesMetaDir(index), "dims"): Unit
    val snap = TxLog.snapshotAt(corpus)
    val coded: Set[String] =
      TxLog.cachedStringSet(spark, codesFilesDir(index), "file_name")
    val newFiles = snap.files.filterNot(f => coded(f.path))
    if (newFiles.isEmpty) return 0L
    val vecs0 = TxLog.readFiles(spark, corpus, newFiles)
    // the anti-joined increment feeds the count AND the encode/train —
    // checkpoint it so the codes-table scan + anti-join run once (a
    // fresh build's vecs is a bare parquet read: nothing to save)
    val vecs =
      if (coded.isEmpty) vecs0
      else vecs0.join(
        TxLog.readAt(spark, codesDir(index)).select(col(idCol)).distinct(),
        Seq(idCol), "left_anti").localCheckpoint(true)
    val n = vecs.count()
    if (n > 0) {
      val codes =
        if (TxLog.versions(cbDir(index)).isEmpty) {
          val (codes0, cb) = Pq.model(vecs, idCol, embCol,
            dims = PqDims, m = PqM, k = pqKOf(n), iters = PqIters)
          val cbMat = cb.localCheckpoint(true)
          require(cbMat.count() > 0,
            s"PQ codebook training at ${cbDir(index)} yielded 0 codewords " +
              "on a nonempty batch — refusing to advance the watermark")
          TxLog.append(spark, cbMat, cbDir(index), "cid", nParts = 1): Unit
          codes0
        } else Pq.encode(vecs, TxLog.readAt(spark, cbDir(index)),
          idCol, embCol, dims = PqDims, m = PqM)
      TxLog.appendClustered(spark, codes, codesDir(index), idCol,
        clusterCol = col("sub"), nClusters = PqSubClusters): Unit
    }
    TxLog.append(spark,
      newFiles.map(_.path).toDF("file_name"), codesFilesDir(index), "file_name"): Unit
    n
  }

  final case class MaintainReport(vecsIndexed: Long, filesBefore: Long,
      filesAfter: Long, dvsBefore: Long, dvsAfter: Long, reclaimed: Long)

  /** One idempotent pass returning the index to the freshly-built
    * shape: (1) assign corpus files not yet in the watermark (the meta
    * binding supplies the columns — a meta-less legacy index REFUSES);
    * (2) re-cluster ALL assignments to one file per list, DVs folded,
    * one atomic commit; (3) fold the watermark; (4) vacuum every
    * sibling. The trained quantizer is never retrained — serving
    * through the rewrite is row-identical. */
  def maintain(spark: SparkSession, corpus: Path, index: Path,
      vacuumKeep: Int = 1, vacuumMinAgeMs: Long = 0L): MaintainReport = {
    val (idCol, embCol, nClusters) = readMeta(spark, index).getOrElse {
      if (TxLog.versions(index).isEmpty) ("vec_id", "embedding", 8) // fresh: maintain IS the build
      else throw new IllegalStateException(
        s"ANN index at $index predates the _meta sidecar — its binding is unknown " +
          "and maintenance will not guess one. Run AnnIndex.ensureIndexed once with " +
          "the original idCol/embCol/nClusters to backfill _meta, then maintain.")
    }
    val indexedNew = ensureIndexed(spark, corpus, index, idCol, embCol, nClusters)
    val snap0 = TxLog.snapshotAt(index)
    val dvs0 = snap0.files.count(_.dv.isDefined).toLong
    if (snap0.files.nonEmpty)
      TxLog.compactClustered(spark, index, "cent_id",
        clusterCol = col("cent_id"), nClusters = nClusters): Unit
    if (TxLog.snapshotAt(filesDir(index)).files.size > 1)
      TxLog.compact(spark, filesDir(index), "file_name", nParts = 1): Unit
    // the PQ sibling (if built) degrades the same two ways — encode
    // corpus files that arrived since, re-cluster the codes back to
    // their per-subspace layout with DVs folded, fold its watermark.
    // Behind the same no-guessing fence: only a self-describing codes
    // sibling (its _meta binding) is maintained.
    readPqMeta(spark, index).foreach { case (pqId, pqEmb) =>
      ensurePq(spark, corpus, index, pqId, pqEmb): Unit
      if (TxLog.snapshotAt(codesDir(index)).files.nonEmpty)
        TxLog.compactClustered(spark, codesDir(index), pqId,
          clusterCol = col("sub"), nClusters = PqSubClusters): Unit
      if (TxLog.snapshotAt(codesFilesDir(index)).files.size > 1)
        TxLog.compact(spark, codesFilesDir(index), "file_name", nParts = 1): Unit
    }
    val reclaimed = Seq(index, centDir(index), filesDir(index), metaDir(index),
        cbDir(index), codesDir(index), codesMetaDir(index), codesFilesDir(index))
      .map { t =>
        if (TxLog.versions(t).isEmpty) 0
        else TxLog.vacuum(t, keepVersions = math.max(1, vacuumKeep),
          minAgeMs = vacuumMinAgeMs).size
      }.sum.toLong
    val snap1 = TxLog.snapshotAt(index)
    MaintainReport(indexedNew, snap0.files.size.toLong, snap1.files.size.toLong,
      dvs0, snap1.files.count(_.dv.isDefined).toLong, reclaimed)
  }

  /** The same cure for the IVFADC pair (knn06's four tables): the
    * assignments re-cluster to one file per list and the PQ codes
    * re-cluster back to their per-subspace layout, each folding its
    * knn08 DV sidecars, then both vacuum. Two commits — maintenance is
    * idempotent and readers never block, so cross-table atomicity
    * (which [[TxLog.transact]] gives WRITES) buys nothing here.
    * Returns (assignment files, code files) after. */
  def maintainIvfAdc(spark: SparkSession, assignments: Path, codes: Path,
      nClusters: Int = 8, subClusters: Int = 4,
      vacuumKeep: Int = 1, vacuumMinAgeMs: Long = 0L): (Long, Long) = {
    if (TxLog.snapshotAt(assignments).files.nonEmpty)
      TxLog.compactClustered(spark, assignments, "cent_id",
        clusterCol = col("cent_id"), nClusters = nClusters): Unit
    if (TxLog.snapshotAt(codes).files.nonEmpty)
      TxLog.compactClustered(spark, codes, "vec_id",
        clusterCol = col("sub"), nClusters = subClusters): Unit
    Seq(assignments, codes).foreach { t =>
      TxLog.vacuum(t, keepVersions = math.max(1, vacuumKeep),
        minAgeMs = vacuumMinAgeMs): Unit
    }
    (TxLog.snapshotAt(assignments).files.size.toLong,
      TxLog.snapshotAt(codes).files.size.toLong)
  }
}
