package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` bridge the V1 streaming-source contract
  * requires. `Source.getBatch` must return a DataFrame whose logical
  * plan carries `isStreaming = true` (MicroBatchExecution asserts it)
  * and is associated with the emitting stream — but the natural way to
  * build a micro-batch over a known parquet file list is a plain
  * `spark.read.parquet(files)`, which is a batch relation. This shim
  * re-tags that relation in place — the SAME LogicalRelation node, so
  * predicate pushdown, column pruning, and vectorized reading are
  * untouched — exactly what Spark's own FileStreamSource does
  * internally. Package-placed to reach the `private[sql]` members;
  * contains no logic beyond the re-tag.
  */
object StreamingShims {

  /** Re-tag `df`'s file relation as a streaming batch emitted by
    * `stream`. */
  def asStreamingBatch(spark: SparkSession, df: DataFrame, stream: SparkDataStream): DataFrame = {
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation =>
        lr.copy(isStreaming = true).withStream(stream)
    }
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
  }

  /** A zero-row streaming batch with the given schema (empty
    * micro-batch: every commit in range was skipped as a non-data
    * change). */
  def emptyStreamingBatch(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val cs = spark.asInstanceOf[ClassicSparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }

  /** Bridge to the `protected[sql]` catalyst-to-source filter
    * translation (DataSourceStrategy.translateFilter) — used by the
    * catalog's early DELETE-to-filters conversion on deletion-vector
    * snapshots. Pure delegation, no logic. */
  def translateFilter(e: org.apache.spark.sql.catalyst.expressions.Expression):
      Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** Bridge to the `private[sql]` V1-filter → V2-predicate conversion. */
  def filterToV2(f: org.apache.spark.sql.sources.Filter):
      org.apache.spark.sql.connector.expressions.filter.Predicate = f.toV2
}
