package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.domain.ParserConfig
import graft.ports.RecordParser

/** Avro Object Container File scan — a beyond-reference row format (the
  * reference routes only csv/json/txt/xml/xlsx, parser_adapter.rs:32-58;
  * Avro is the lake's default log-shipping/Kafka-archive format, so a
  * Spark-native ingestion engine must read it).
  *
  * Backed by the hand-rolled DSv2 source (graft.sources.AvroDataSource):
  * sync-marker split scans (a 10 GB file fans out into ~80 parallel
  * tasks), decoder-level column pruning, native types preserved —
  * none of the reference's whole-file-in-RAM buffering.
  */
object AvroParser extends RecordParser {

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame = {
    graft.sources.AvroDataSource.enable(spark) // see its scaladoc
    spark.read.format("avro").load(path)
  }
}
