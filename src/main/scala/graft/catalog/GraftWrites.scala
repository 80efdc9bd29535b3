package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxLog

/** SQL WRITE path for TxLog tables, as the DSv2 `V1Write` fallback —
  * the same bridge Spark's own JDBC catalog writes through. The
  * "fallback" is only plumbing: the distributed write itself is
  * [[TxLog]]'s staged-commit protocol (executor-parallel parquet stage,
  * footer-only stats, claim-fenced ACID commit with OCC validation and
  * CHECK constraints), so `INSERT INTO lake.t SELECT ...` pays exactly
  * what the API surface pays — a full DataWriter implementation would
  * re-implement that staging for no gain. The reference has no SQL or
  * write-catalog surface at all (its sinks are the port list in
  * /root/reference/src/domain/ports.rs:5-30).
  *
  *  - `INSERT INTO` → [[TxLog.append]] (or [[TxLog.appendPartitioned]]
  *    when the table was created `PARTITIONED BY`);
  *  - `INSERT OVERWRITE` → [[TxLog.overwrite]] (one commit replaces the
  *    live set; time travel still sees the old state);
  *  - `DELETE FROM ... WHERE` → [[TxLog.deleteWhere]] (predicate COW:
  *    only files containing a match are rewritten, CDC sidecar kept) —
  *    the filter subset Spark can push is translated; anything else
  *    makes `canDeleteWhere` false and Spark reports it unsupported
  *    instead of deleting wrong rows.
  */
private[catalog] object GraftWrites {

  /** The designated stats column for footer pruning: the first integral
    * column (the domain the log's minKey/maxKey skipping works over),
    * else the first column (its per-column stats still recorded). */
  def defaultStatsCol(schema: StructType): String =
    schema.fields.find(f => f.dataType == LongType || f.dataType == IntegerType)
      .map(_.name).getOrElse(schema.fields.head.name)

  def insert(dir: Path, data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    val statsCol = defaultStatsCol(data.schema)
    // hash-partitioned on the partition tuple across the cluster's
    // parallelism: tasks run in parallel, yet each partition VALUE
    // still lands in one task → one file per value, so equality
    // reads stay one-file metadata lookups
    val partCols = TxLog.partitionColsOf(dir)
    val par = spark.sparkContext.defaultParallelism
    (overwrite, partCols.nonEmpty) match {
      case (true, true) =>
        TxLog.overwritePartitioned(spark, data, dir, partCols, statsCol, nParts = par): Unit
      case (true, false) => TxLog.overwrite(spark, data, dir, statsCol): Unit
      case (false, true) =>
        TxLog.appendPartitioned(spark, data, dir, partCols, statsCol, nParts = par): Unit
      case (false, false) => TxLog.append(spark, data, dir, statsCol): Unit
    }
  }

  /** Source-filter → Column translation, three-valued logic preserved
    * (a NULL predicate row is NOT deleted — SQL DELETE semantics,
    * enforced again by deleteWhere's coalesce). None = untranslatable,
    * surfaced through canDeleteWhere. */
  def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.Not(c) => toColumn(c).map(!_)
    case sources.And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case sources.Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** Write + delete support shared by the catalog's table shapes. Writes
  * always target the table DIRECTORY's latest state (appends commit on
  * top of whatever the claim-fenced retry sees) — Spark's analyzer
  * already rejects inserts into time-travel relations, so a pinned
  * `snapVersion` never receives one.
  *
  * Also the row-level DML surface: implementing
  * [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]
  * lets Spark's analyzer rewrite `UPDATE`/`MERGE INTO`/non-translatable
  * `DELETE` into group-based copy-on-write plans served by
  * [[GraftRowLevelOperation]]; translatable DELETEs are converted BACK
  * to the metadata-only [[deleteWhere]] path by Spark's own
  * OptimizeMetadataOnlyDeleteFromTable. The `_graft_file` metadata
  * column (the rewrite's group id) resolves only through the row-level
  * scan — plain reads stay on the vectorized delegate. */
private[catalog] trait TxLogWriteSupport extends SupportsWrite with SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  def dir: Path

  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftRowLevel.MetaCol)

  /** The relation's pinned snapshot version, when the table shape has
    * one — row-level DML scans read THIS version so the main rewrite
    * scan and the runtime matching scan agree on the file set, and any
    * concurrent commit surfaces as a clean OCC abort in replaceStaged
    * rather than an empty-candidate silent no-op. */
  protected def pinnedSnapVersion: Option[Long] = None

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    GraftRowLevelBuilder(dir, schema(), pinnedSnapVersion, info)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ovr: Boolean): Unit =
              GraftWrites.insert(dir, data, overwrite || ovr)
          }
      }
    }

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    filters.forall(GraftWrites.toColumn(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    val pred = filters.flatMap(GraftWrites.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    TxLog.deleteWhere(SparkSessionActive.get, dir, pred,
      GraftWrites.defaultStatsCol(schema())): Unit
  }
}

private[catalog] object SparkSessionActive {
  def get: org.apache.spark.sql.SparkSession = org.apache.spark.sql.SparkSession.active
}

/** The catalog's standard table shape: scans delegate to Spark's own
  * parquet V2 table over the snapshot's live files (pushdown, pruning,
  * vectorization unchanged); writes and deletes go through
  * [[TxLogWriteSupport]] into the transaction log. */
private[catalog] case class GraftTable(
    tableName: String, dir: Path, snapVersion: Long, tableSchema: StructType,
    delegate: SupportsRead)
  extends SupportsRead with TxLogWriteSupport {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.BATCH_WRITE) // row-level rewrites are real V2 writes
    s.add(TableCapability.TRUNCATE)
    s
  }

  override protected def pinnedSnapVersion: Option[Long] = Some(snapVersion)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftDelegatingScanBuilder(delegate.newScanBuilder(options), dir,
      snapVersion, tableSchema)
}

/** The CTAS staging shape (see [[GraftCatalog.stageCreate]]): the v0 log
  * and all CTAS data land in the hidden `tmp` dir through the normal
  * [[TxLogWriteSupport]] staged-commit path, and `commitStagedChanges`
  * publishes the whole table with ONE atomic directory rename — so a
  * failed CTAS aborts to nothing and readers never see a partial table. */
private[catalog] case class GraftStagedTable(
    tableName: String, tmp: Path, target: Path, tableSchema: StructType)
  extends org.apache.spark.sql.connector.catalog.StagedTable with TxLogWriteSupport {

  override def dir: Path = tmp
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] = {
    val s = new java.util.HashSet[TableCapability]()
    s.add(TableCapability.V1_BATCH_WRITE)
    s.add(TableCapability.TRUNCATE)
    s
  }

  override def commitStagedChanges(): Unit = {
    java.nio.file.Files.createDirectories(target.getParent)
    // create-exclusive semantics: if a concurrent CTAS won the race, the
    // move fails and this staging dir is torn down by abortStagedChanges
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
  }

  override def abortStagedChanges(): Unit = {
    if (java.nio.file.Files.isDirectory(tmp)) {
      val s = java.nio.file.Files.walk(tmp)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p): Unit)
      finally s.close()
    }
  }
}
