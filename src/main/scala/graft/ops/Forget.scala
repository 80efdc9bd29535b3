package graft.ops

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ATOMIC RIGHT-TO-BE-FORGOTTEN across a corpus table and EVERY
  * keyed derived-index sibling, in ONE multi-table transaction —
  * the round-15 verdict's #4. The GDPR flow before this was two (or
  * more) independent merge-on-read deletes (sim14: corpus then ANN
  * index), so a reader between them could resolve an index snapshot
  * still naming keys the corpus had already erased. [[TxLog.transact]]
  * (commit-marker two-phase commit) makes every participant's delete
  * flip with one create-exclusive outcome file: any reader sees all of
  * them or none of them.
  *
  * Participants are discovered by the sibling naming convention `CALL
  * maintain` already drives (`<t>_text_ix`, its `_pos` positional
  * sibling, `<t>_ann_ix`, `<t>_ann_ix_codes`). Bloom siblings are NOT
  * participants by design: their rows are FILE-granular digests, not
  * key rows — a forgotten key leaves its file's digest valid (bloom
  * answers may stale-true; the lookup always re-checks the corpus,
  * whose row is gone in the same atomic flip).
  *
  * Post-transaction bookkeeping — the text index's (n_docs, total_len)
  * shrink and the MaxScore staleness counter — runs AFTER the commit
  * and is pure catch-up: a crash in between leaves rankings EXACT
  * anyway, because DV presence on the index forces the scan-only
  * live-df recount (TextIndex round-16 staleness rule) and the next
  * maintain rebuilds stats from live postings. Atomicity is spent
  * where erasure demands it: the data rows.
  *
  * Reference behavior anchor: the reference pipeline has no deletion
  * story at all (inserts only, mongodb/data_repo.rs); the semantics
  * here follow the GDPR-erasure shape of lakehouse engines (Delta's
  * DELETE + downstream-reindex pattern), tightened to one transaction.
  */
object Forget {

  final case class ForgetReport(
      corpusVersion: Long,
      participants: Seq[String],
      keysForgotten: Long,
      postingsDeleted: Long)

  /** Discovered sibling participants of `corpus` under `base`, with
    * each one's key column: the text index keys on the cast `doc_id`
    * postings column; the ANN index (and its PQ codes sibling) keys on
    * the id column its _meta binding records. */
  private def siblings(spark: SparkSession, base: Path,
      name: String): Seq[(Path, String)] = {
    def live(p: Path): Boolean =
      Files.isDirectory(p.resolve("_graft_log")) && TxLog.versions(p).nonEmpty
    val tix = base.resolve(s"${name}_text_ix")
    val pos = base.resolve(s"${name}_text_ix_pos")
    val aix = base.resolve(s"${name}_ann_ix")
    val codes = base.resolve(s"${name}_ann_ix_codes")
    val annId = if (live(aix)) AnnIndex.boundIdCol(spark, aix) else None
    (if (live(tix)) Seq((tix, "doc_id")) else Nil) ++
      (if (live(pos)) Seq((pos, "doc_id")) else Nil) ++
      annId.map(id => (aix, id)).toSeq ++
      (if (live(codes)) annId.map(id => (codes, id)).toSeq else Nil)
  }

  /** Erase `keys` (cast to the corpus key column) from the corpus AND
    * every keyed index sibling in one atomic transaction; then settle
    * the text index's derived scalars. Idempotent under redelivery:
    * re-deleting already-DV'd keys is a no-op per table, and the stats
    * shrink is computed from what the keys still touched. */
  def forget(spark: SparkSession, base: Path, tableName: String,
      keys: DataFrame, keyCol: String): ForgetReport = {
    val corpus = base.resolve(tableName)
    require(Files.isDirectory(corpus.resolve("_graft_log")),
      s"no TxLog table '$tableName' under $base")
    // one deterministic key set feeds every participant
    val k = keys.select(col(keyCol)).distinct().localCheckpoint(true)
    val nKeys = k.count()
    val parts = siblings(spark, base, tableName)
    val tix = base.resolve(s"${tableName}_text_ix")
    // the text index's stats contribution of the still-live postings
    // these keys hold — measured BEFORE the atomic flip (the single-
    // maintainer contract makes this exact), applied after it
    val textGone: Option[(Long, Long)] =
      if (!parts.exists(_._1 == tix)) None
      else Some(TextIndex.deletedContribution(spark, tix,
        k.withColumnRenamed(keyCol, "doc_id")))
    val ops: Seq[TxLog.TxnOp] =
      TxLog.TxnDeleteMor(corpus, k, keyCol) +:
        parts.map { case (table, idCol) =>
          TxLog.TxnDeleteMor(table, k.withColumnRenamed(keyCol, idCol), idCol)
        }
    val versions = TxLog.transact(spark, ops)
    // catch-up scalars (see scaladoc: exactness never depends on these
    // landing — DV-presence staleness guards the window)
    textGone.foreach { case (nGone, lenGone) =>
      TextIndex.noteDeleted(spark, tix, nGone, lenGone)
    }
    ForgetReport(versions(corpus.toRealPath()),
      parts.map(_._1.getFileName.toString),
      nKeys, textGone.map(_._1).getOrElse(0L))
  }
}
