package graft.domain

import java.sql.Timestamp

/** Control-plane models, mirroring the reference's domain layer
  * (reference: src/domain/models.rs:4-29). The data plane is a Spark
  * DataFrame everywhere the reference used `Vec<serde_json::Value>`.
  */

/** Routing rule: regex over the object key -> destination table.
  * reference: src/domain/models.rs:4-9; seed rows migration.js:5-51. */
final case class IngestionConfigRule(
    pattern: String,
    targetTable: String,
    parserConfig: Option[ParserConfig] = None)

/** Parser options carried by a rule. Only `headers` is ever consumed
  * (reference: csv_parser.rs:14-17); `delimiter`/`hasHeaders`/`sheetIndex`
  * exist in the reference's seed data but were dead config
  * (migration.js:9-12,23-25) — here they are honored, as a documented
  * improvement. */
final case class ParserConfig(
    headers: Option[Seq[String]] = None,
    delimiter: Option[String] = None,
    hasHeaders: Option[Boolean] = None,
    sheetIndex: Option[Int] = None)

/** A file discovered by the event loop. reference: src/domain/models.rs:11-15. */
final case class FileToProcess(bucket: String, key: String) {
  /** "bucket/key" — the enrichment literal stamped on every row
    * (reference: ingestion_service.rs:85-87). */
  def fileName: String = s"$bucket/$key"
}

/** Audit-log row. reference: src/domain/models.rs:17-29. */
final case class IngestionLog(
    logId: String,
    fileName: String,
    startTime: Timestamp,
    endTime: Option[Timestamp],
    status: String, // IngestionStatus.{Success,Failed}
    message: Option[String])

object IngestionStatus {
  val Success = "Success"
  val Failed = "Failed"
}

/** Error taxonomy, mirroring reference src/domain/error.rs:3-15. */
sealed abstract class IngestionError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)
object IngestionError {
  final case class ConfigError(msg: String) extends IngestionError(msg)
  final case class SourceError(msg: String, cause: Throwable = null) extends IngestionError(msg, cause)
  final case class ParseError(msg: String, cause: Throwable = null) extends IngestionError(msg, cause)
  final case class DatabaseError(msg: String, cause: Throwable = null) extends IngestionError(msg, cause)
  final case class NoMatchingRule(key: String) extends IngestionError(s"no matching ingestion rule for key: $key")
}
