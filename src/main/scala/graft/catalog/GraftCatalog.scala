package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Collections

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxLog

/** DataSource-V2 catalog exposing [[graft.ops.TxLog]] tables to plain
  * SQL — snapshot reads and time travel become first-class statements:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.lake.base", "/data/lake")
  *   spark.sql("SELECT * FROM lake.docs")                  // latest snapshot
  *   spark.sql("SELECT * FROM lake.docs VERSION AS OF 3")  // time travel
  * }}}
  *
  * Each table is a directory under `base` holding a `_graft_log`. The
  * catalog resolves the snapshot's LIVE file list and schema from the
  * log (metadata only — checkpoint replay reads <= 10 commits at any
  * history depth) and delegates the scan to Spark's own parquet V2
  * table over exactly those files, so column pruning, predicate
  * pushdown, and vectorized reading all apply unchanged. The reference
  * has no SQL surface at all (its data plane is the port list in
  * /root/reference/src/domain/ports.rs:5-30); this is the lakehouse
  * analog of DESCRIBE-less direct reads.
  *
  * A snapshot whose files carry merge-on-read deletion vectors cannot
  * be served by a bare parquet scan (deleted rows would resurface); for
  * those the catalog returns a schema-only [[GraftDvTable]] and the
  * [[ResolveDvSnapshots]] analyzer rule (registered via
  * [[GraftExtensions]]) swaps the relation for TxLog.readAt's
  * DV-applying plan during analysis — transparent SQL either way.
  *
  * The catalog is also WRITABLE SQL: `CREATE TABLE [PARTITIONED BY]` /
  * CTAS commit a schema-carrying v0, `INSERT INTO` / `INSERT OVERWRITE`
  * run TxLog's staged ACID appends (see [[GraftWrites]] — the V1Write
  * bridge, Spark's own JDBC-catalog write route), `DELETE FROM ...
  * WHERE` is the predicate copy-on-write delete, and `DROP`/rename
  * manage the directory. Every SQL write honors the same claim-fenced
  * commit protocol, OCC validation, and CHECK constraints as the API.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var base: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val b = options.get("base")
    require(b != null, s"catalog $name needs spark.sql.catalog.$name.base")
    base = Paths.get(b).normalize()
  }

  override def name(): String = catalogName

  /** Identifier segments are data (a backticked name can carry anything),
    * so they must never act as paths: `CALL lake.vacuum('../x')` or
    * ``lake.`../../etc` `` would otherwise address — and for vacuum/DROP,
    * destroy — directories OUTSIDE the catalog base. Each segment must be
    * a plain child name, and the resolved dir must stay under base. */
  private def safeResolve(segments: Seq[String]): Path = {
    segments.foreach { s =>
      require(s.nonEmpty && s != "." && s != ".." &&
        !s.contains('/') && !s.contains('\\') && !s.contains('\u0000'),
        s"illegal identifier segment '$s': names must be plain child names " +
        "(no path separators or '..')")
    }
    val dir = segments.foldLeft(base)(_.resolve(_)).normalize()
    require(dir.startsWith(base) && dir != base,
      s"identifier ${segments.mkString(".")} escapes catalog base $base")
    dir
  }

  private def tableDir(ident: Identifier): Path =
    safeResolve(ident.namespace().toSeq :+ ident.name)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = if (namespace.isEmpty) base else safeResolve(namespace.toSeq)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(p => Files.isDirectory(p.resolve("_graft_log")))
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray.sortBy(_.name)
      finally s.close()
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    Files.isDirectory(tableDir(ident).resolve("_graft_log"))

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style metadata tables: lake.`t$history` / lake.`t$files`
    // (backticks — `$` needs quoting in SQL identifiers)
    ident.name.split('$') match {
      case Array(base, kind) =>
        val baseIdent = Identifier.of(ident.namespace(), base)
        if (!tableExists(baseIdent)) throw new NoSuchTableException(baseIdent)
        val schema = GraftMetaTable.schemaFor(kind)
        return GraftMetaTable(s"$catalogName.${ident.name}",
          tableDir(baseIdent), kind, schema)
      case _ => ()
    }
    snapshotTable(ident, None)
  }

  /** SQL `VERSION AS OF <v>` lands here (Spark passes the literal).
    * A non-numeric literal resolves as a TAG ref (`VERSION AS OF
    * 'release-1'` — Iceberg's tag semantics, set via
    * `CALL <cat>.tag(...)` or TxLog.setTag). */
  override def loadTable(ident: Identifier, version: String): Table =
    snapshotTable(ident, Some(
      try version.toLong
      catch {
        case _: NumberFormatException =>
          if (!tableExists(ident)) throw new NoSuchTableException(ident)
          val tags = TxLog.tags(tableDir(ident))
          tags.getOrElse(version, throw new IllegalArgumentException(
            s"'$version' is neither a commit number nor a tag of " +
            s"$catalogName.${ident.name} (tags: ${tags.keys.toSeq.sorted.mkString(", ")})"))
      }))

  /** SQL `TIMESTAMP AS OF <t>` lands here; Spark passes MICROSECONDS
    * since epoch. Resolution is Delta's rule: the latest commit whose
    * file mtime is <= t (TxLog.versionAtTimestamp). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    snapshotTable(ident,
      Some(TxLog.versionAtTimestamp(tableDir(ident), timestamp / 1000L)))
  }

  private def snapshotTable(ident: Identifier, version: Option[Long]): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val snap = TxLog.snapshotAt(dir, version)
    val schema: Option[StructType] = TxLog.tableSchema(dir, Some(snap.version))
    if (snap.files.exists(_.dv.isDefined) ||
        schema.exists(graft.ops.ColumnMapping.needsMapping)) {
      // DV-carrying or column-mapped snapshot: a bare parquet scan
      // cannot serve it (deleted rows would resurface / physical names
      // would leak), so return the schema-only table and let the
      // ResolveDvSnapshots analyzer rule swap in TxLog.readAt's plan
      // (merge-on-read + physical->logical projection, pushdown intact)
      val s = schema.getOrElse(
        TxLog.readAt(SparkSession.active, dir, Some(snap.version)).schema)
      return GraftDvTable(s"$catalogName.${ident.name}@v${snap.version}",
        dir, snap.version, s)
    }
    val paths = snap.files.map(f => dir.resolve(f.path).toString)
    val parquet = ParquetTable(s"$catalogName.${ident.name}@v${snap.version}",
      SparkSession.active,
      new CaseInsensitiveStringMap(Collections.emptyMap()),
      paths, schema, classOf[ParquetFileFormat])
    val s = schema.getOrElse(parquet.schema)
    GraftTable(s"$catalogName.${ident.name}@v${snap.version}", dir, snap.version,
      s, parquet)
  }

  /** SQL `CREATE TABLE` (and the create half of CTAS): version 0 is a
    * pure-metadata commit carrying the schema and any `PARTITIONED BY`
    * identity columns — later SQL inserts lay data out by them. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(catalogName) ++ ident.namespace() :+ ident.name)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"$catalogName supports only identity PARTITIONED BY columns, got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    TxLog.create(tableDir(ident), schema, partCols): Unit
    loadTable(ident)
  }

  /** ATOMIC CTAS: `CREATE TABLE ... AS SELECT` stages the v0 log AND the
    * inserted data in a hidden side directory, and only an atomic rename
    * publishes the table — a failed CTAS query leaves nothing behind (no
    * committed-empty-table orphan) and a concurrent reader never observes
    * a half-loaded table. Same shape as Delta/Iceberg's staged CTAS. */
  override def stageCreate(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable =
    stageCreate(ident, info.schema(), info.partitions(), info.properties())

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(catalogName) ++ ident.namespace() :+ ident.name)
    val target = tableDir(ident)
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity",
        s"$catalogName supports only identity PARTITIONED BY columns, got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    // staging lives under a dot-dir so listTables (which looks for
    // _graft_log in DIRECT children of a namespace dir) never sees it
    val tmp = base.resolve(".staging")
      .resolve(ident.name + "-" + java.util.UUID.randomUUID().toString)
    Files.createDirectories(tmp.getParent)
    TxLog.create(tmp, schema, partCols): Unit
    GraftStagedTable(s"$catalogName.${ident.name} (staged)", tmp, target, schema)
  }

  private def replaceUnsupported(): Nothing =
    throw new UnsupportedOperationException(
      s"$catalogName does not support REPLACE TABLE [AS SELECT]: the log is " +
      "the table's history and a replace would orphan it; DROP + CREATE, or " +
      "INSERT OVERWRITE to swap contents while keeping time travel")

  override def stageReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = replaceUnsupported()
  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = replaceUnsupported()
  override def stageCreateOrReplace(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo)
      : org.apache.spark.sql.connector.catalog.StagedTable = replaceUnsupported()
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = replaceUnsupported()

  /** SQL `ALTER TABLE ADD COLUMN(S)`: additive evolution as one
    * pure-metadata `set-schema` commit per column — pre-evolution files
    * null-fill on read (the log's schema wins, no footer merge). Other
    * changes (drop/rename/retype) are refused: they would make old
    * files unreadable without a rewrite. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"nested ADD COLUMN is not supported: ${add.fieldNames.mkString(".")}")
        // evolution appends columns; honoring FIRST/AFTER would require a
        // positional rewrite of the log schema AND break the null-fill
        // read of pre-evolution files — refuse rather than silently
        // appending a column the DDL asked to place elsewhere
        require(add.position() == null,
          s"ADD COLUMN ${add.fieldNames()(0)} FIRST/AFTER is not supported: " +
          "evolved columns always append last (pre-evolution files null-fill " +
          "by position-independent name lookup); re-issue without a position")
        TxLog.addColumn(tableDir(ident), add.fieldNames()(0), add.dataType): Unit
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1,
          s"nested RENAME COLUMN is not supported: ${rn.fieldNames.mkString(".")}")
        // column mapping (Delta name mode): one metadata commit — the
        // physical parquet name freezes, only the logical name moves
        TxLog.renameColumn(SparkSession.active, tableDir(ident),
          rn.fieldNames()(0), rn.newName()): Unit
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames.length == 1,
          s"nested DROP COLUMN is not supported: ${del.fieldNames.mkString(".")}")
        TxLog.dropColumn(SparkSession.active, tableDir(ident), del.fieldNames()(0)): Unit
      case other => throw new UnsupportedOperationException(
        s"only ADD/RENAME/DROP COLUMN are supported (got $other); a retype " +
        "would make pre-evolution files unreadable without a rewrite")
    }
    loadTable(ident)
  }

  /** SQL `DROP TABLE`: removes the table directory — data, sidecars,
    * and log. Destructive by contract, like any warehouse drop. */
  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!tableExists(ident)) false
    else {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p): Unit)
      finally s.close()
      true
    }
  }

  /** Maintenance procedures: `CALL lake.compact('t')` etc. (see
    * [[GraftProcedures]]). */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(base, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.All.map(n => Identifier.of(namespace, n)).toArray

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(catalogName) ++ newIdent.namespace() :+ newIdent.name)
    Files.createDirectories(tableDir(newIdent).getParent)
    Files.move(tableDir(oldIdent), tableDir(newIdent)): Unit
  }
}
