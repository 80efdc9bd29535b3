package graft.ops

import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping for TxLog tables — the published Delta "column
  * mapping (name mode)" design: every column carries a stable PHYSICAL
  * name in its `StructField` metadata, parquet data files are written
  * under physical names, and SQL-visible (LOGICAL) names become pure
  * metadata. `ALTER TABLE RENAME COLUMN` is then a one-commit metadata
  * change (the physical name never moves, so no data file is ever
  * rewritten), and `DROP COLUMN` simply removes the logical field —
  * old files keep the physical column, readers stop projecting it, and
  * a later re-`ADD` of the same logical name gets a FRESH physical name
  * so dropped values can never resurrect.
  *
  * Activation is lazy and one-way: tables start UNMAPPED (no metadata —
  * physical == logical everywhere, every code path byte-identical to
  * the pre-mapping engine). The first rename/drop STAMPS the current
  * logical names as frozen physical names. This freeze is what keeps
  * ALL data files of a table uniformly named: files written before
  * activation used the then-logical names, which are exactly the frozen
  * physical names; files written after activation are converted
  * logical→physical at the write boundary. One shared
  * `spark.read.schema(physicalSchema)` therefore serves every file of
  * any age, and renames/drops at any point in history stay consistent
  * (deletion-vector key columns, footer stats and CDC sidecars are all
  * recorded under physical names for the same reason).
  *
  * The reference has no schema surface at all (its rows are dynamic
  * JSON values, /root/reference/src/domain/ports.rs:12-13 —
  * `DataParser::parse` returns `Vec<serde_json::Value>`); this module
  * exists
  * for the lakehouse pillar's SQL DDL parity.
  */
object ColumnMapping {

  /** StructField metadata key holding the physical (parquet) name. */
  val Key = "graft.physical"

  /** The field's physical (parquet file) column name. */
  def physical(f: StructField): String =
    if (f.metadata.contains(Key)) f.metadata.getString(Key) else f.name

  /** Has mapping been ACTIVATED on this schema (any field stamped)?
    * Once true, writes must convert logical→physical and schema
    * evolution must mint fresh physical names. */
  def stamped(s: StructType): Boolean = s.fields.exists(_.metadata.contains(Key))

  /** Does any field's physical name DIFFER from its logical name? Only
    * then do reads/writes need the projection — a stamped-but-identity
    * schema (activation commit not yet followed by a rename) and an
    * unmapped schema both short-circuit to the historical plans. */
  def needsMapping(s: StructType): Boolean =
    s.fields.exists(f => physical(f) != f.name)

  /** The schema as the parquet files see it: physical names, mapping
    * metadata stripped (field nullability/types unchanged). */
  def physicalSchema(s: StructType): StructType =
    StructType(s.fields.map(f =>
      StructField(physical(f), f.dataType, f.nullable, Metadata.empty)))

  /** Physical name of logical column `name`; identity for names not in
    * the schema (metadata columns, pre-schema tables). */
  def physicalOf(s: StructType, name: String): String =
    s.fields.find(_.name == name).map(physical).getOrElse(name)

  /** Stamp every unstamped field with its current name as the frozen
    * physical name — the activation step of the first rename/drop.
    * Idempotent: already-stamped fields keep their physical name. */
  def stamp(s: StructType): StructType =
    StructType(s.fields.map { f =>
      if (f.metadata.contains(Key)) f
      else f.copy(metadata =
        new MetadataBuilder().withMetadata(f.metadata).putString(Key, f.name).build())
    })

  /** A fresh physical name for a column added AFTER activation: must
    * collide with no physical name ever used by this table (a dropped
    * column's physical name survives in old files), so it is minted
    * from a UUID — the Delta `col-<uuid>` rule. */
  def freshPhysical(): String =
    s"col_${UUID.randomUUID().toString.replace("-", "").take(16)}"

  /** A stamped field for a NEW column: frozen-physical = logical name
    * on unactivated tables, fresh UUID name once mapping is active. */
  def newField(cur: StructType, name: String, dataType: DataType): StructField =
    if (!stamped(cur)) StructField(name, dataType, nullable = true)
    else StructField(name, dataType, nullable = true,
      metadata = new MetadataBuilder().putString(Key, freshPhysical()).build())

  /** Physicalize an arbitrary LOGICAL-named row schema (a projection /
    * write subset of `table`'s columns) by name lookup — fields not in
    * the table schema (metadata columns) keep their names. */
  def physicalize(rowSchema: StructType, table: StructType): StructType =
    StructType(rowSchema.fields.map(f =>
      StructField(physicalOf(table, f.name), f.dataType, f.nullable, Metadata.empty)))

  /** Rename a LOGICAL-named frame's table columns to their physical
    * names (columns not in the schema — `_change_type`, cluster tags —
    * pass through). Identity when the schema needs no mapping. */
  def toPhysical(df: DataFrame, s: StructType): DataFrame =
    if (!needsMapping(s)) df
    else {
      val m = s.fields.map(f => f.name -> physical(f)).toMap
      df.select(df.columns.map(c => df(c).as(m.getOrElse(c, c))): _*)
    }

  /** Rename a PHYSICAL-named frame's columns to the schema's logical
    * names (non-table columns pass through). Physical names are unique
    * per table, so the reverse map is unambiguous. Identity when the
    * schema needs no mapping. */
  def toLogical(df: DataFrame, s: StructType): DataFrame =
    if (!needsMapping(s)) df
    else {
      val m = s.fields.map(f => physical(f) -> f.name).toMap
      df.select(df.columns.map(c => df(c).as(m.getOrElse(c, c))): _*)
    }
}
