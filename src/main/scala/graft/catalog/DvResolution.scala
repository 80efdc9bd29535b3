package graft.catalog

import java.nio.file.Path
import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TxLog

/** Catalog stand-in for a snapshot whose files carry merge-on-read
  * deletion vectors. A bare parquet scan cannot serve it (deleted rows
  * would resurface), so the catalog returns this schema-only table and
  * [[ResolveDvSnapshots]] — an analyzer rule registered through
  * [[graft.GraftExtensions]] — swaps the relation for the DV-applying logical
  * plan ([[TxLog.readAt]]: per-file broadcast anti-joins over the
  * churn-sized sidecar keys) before any scan is planned. Catalyst then
  * optimizes THAT plan as usual: user predicates and column pruning
  * flow through the anti-join to the underlying parquet scans, so the
  * SQL surface pays exactly what the API surface pays.
  *
  * If the extension is not registered the first read fails with an
  * instructive error instead of wrong results.
  */
private[catalog] case class GraftDvTable(
    tableName: String, dir: Path, snapVersion: Long, tableSchema: StructType)
  extends SupportsRead {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    throw new UnsupportedOperationException(
      s"$tableName@v$snapVersion carries merge-on-read deletion vectors; add " +
      "graft.GraftExtensions to spark.sql.extensions (or compact " +
      "the table / read via TxLog.readAt) to serve it")
}

/** Rewrites [[GraftDvTable]] relations into the deletion-vector-applying
  * plan, preserving the relation's output attribute ids so every
  * already-resolved reference upstream keeps binding. Runs at analysis
  * time — before capability checks build scans — so `SELECT ... FROM
  * lake.t [VERSION AS OF v]` over a DV-carrying snapshot is transparent
  * SQL. The snapshot version was pinned when the catalog resolved the
  * table, so the rewrite is deterministic under concurrent commits. */
case class ResolveDvSnapshots(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftDvTable] =>
      val t = r.table.asInstanceOf[GraftDvTable]
      val resolved = TxLog.readAt(spark, t.dir, Some(t.snapVersion))
        .queryExecution.analyzed
      require(resolved.output.length == r.output.length,
        s"DV snapshot plan arity ${resolved.output.length} != relation ${r.output.length}")
      Project(r.output.zip(resolved.output).map { case (o, a) =>
        Alias(a, o.name)(exprId = o.exprId)
      }, resolved)
  }
}

