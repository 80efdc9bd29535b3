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
    // Spark's default useV1SourceList reserves "avro" for the absent
    // spark-avro connector, which would force our DSv2 provider through
    // a V1 path it can't satisfy; runtime-drop it so format("avro")
    // resolves via ServiceLoader in ANY session (GraftSession sets the
    // same, but the parse path must not depend on the session factory).
    val key = "spark.sql.sources.useV1SourceList"
    // no-default get: returns the ENTRY default ("avro,csv,...") when
    // unset — a "" fallback would mask it and skip the rewrite
    val v1List = spark.conf.get(key)
    if (v1List.contains("avro"))
      spark.conf.set(key,
        v1List.split(",").map(_.trim).filter(_ != "avro").mkString(","))
    spark.read.format("avro").load(path)
  }
}
