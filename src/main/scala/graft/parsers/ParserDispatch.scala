package graft.parsers

import graft.domain.IngestionError.ParseError
import graft.ports.RecordParser

/** File-type dispatch (reference: src/application/ingestion_service.rs:149-158
  * extension extraction; src/infrastructure/parser_adapter.rs:32-58 routing):
  * the extension is the last '.'-segment, lowercased; unsupported types are
  * a ParseError. `.pdf` is intentionally unsupported, matching the
  * reference (parser_adapter.rs:54-57 — advertised but never implemented).
  */
object ParserDispatch {

  /** reference: ingestion_service.rs:149-158 — lowercased last extension. */
  def extractFileType(key: String): String = {
    val idx = key.lastIndexOf('.')
    if (idx < 0 || idx == key.length - 1) ""
    else key.substring(idx + 1).toLowerCase
  }

  def parserFor(fileType: String): RecordParser = fileType match {
    case "csv"          => CsvParser
    case "json"         => JsonParser
    case "txt" | "log"  => TxtParser
    case "xml"          => XmlParser
    case "xlsx" | "xls" => ExcelParser
    case "orc"          => OrcParser // beyond-reference columnar source
    case "avro"         => AvroParser // beyond-reference row format
    case "parquet"      => ParquetPassthroughParser // beyond-reference
    case other          => throw ParseError(s"unsupported file type: $other")
  }
}
