package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.domain.ParserConfig
import graft.ports.RecordParser

/** Parquet scan — beyond-reference, like OrcParser: a lake-to-lake
  * ingest is a parquet-in → enrich → parquet/NoSQL-out passthrough, and
  * the engine should express it without a format conversion detour.
  * Splittable row-group scans, pushdown, pruning — all native.
  */
object ParquetPassthroughParser extends RecordParser {

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame =
    spark.read.parquet(path)
}
