package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.domain.ParserConfig
import graft.ports.RecordParser

/** ORC scan — a beyond-reference columnar source (the reference routes
  * only csv/json/txt/xml/xlsx, parser_adapter.rs:32-58; a Spark-native
  * engine should also ingest the columnar formats a lake actually holds).
  *
  * Spark's ORC reader is splittable and vectorized: stripes become scan
  * partitions, predicates and column pruning push into the stripe reader,
  * so a 100 TB ORC ingest parallelizes without the whole-file buffering
  * the reference's byte-oriented parsers imply. Native types are
  * preserved (like JSON, unlike the all-string text parsers).
  */
object OrcParser extends RecordParser {

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame =
    spark.read.orc(path)
}
