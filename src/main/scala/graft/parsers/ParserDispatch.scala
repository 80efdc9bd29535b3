package graft.parsers

import graft.domain.IngestionError.ParseError
import graft.ports.RecordParser

/** File-type dispatch (reference: src/application/ingestion_service.rs:149-158
  * extension extraction; src/infrastructure/parser_adapter.rs:32-58 routing):
  * the extension is the last '.'-segment, lowercased; unsupported types are
  * a ParseError. `.pdf` — advertised by the reference but never implemented
  * there (parser_adapter.rs:54-57 errors) — routes to the pure-JVM
  * [[PdfParser]] (round 10, a documented improvement over the reference's
  * error path); malformed/encrypted/out-of-subset PDFs still ParseError,
  * so the failure audit trail (ing09) is unchanged for bad drops.
  */
object ParserDispatch {

  /** reference: ingestion_service.rs:149-158 — lowercased last extension. */
  def extractFileType(key: String): String = {
    val idx = key.lastIndexOf('.')
    if (idx < 0 || idx == key.length - 1) ""
    else key.substring(idx + 1).toLowerCase
  }

  def parserFor(fileType: String): RecordParser = fileType match {
    case "csv"              => CsvParser
    case "json"             => JsonParser
    case "jsonl" | "ndjson" => JsonlParser // beyond-reference: line-split JSON
    case "txt" | "log"      => TxtParser
    case "xml"              => XmlParser
    case "xlsx" | "xls"     => ExcelParser
    case "orc"              => OrcParser // beyond-reference columnar source
    case "avro"             => AvroParser // beyond-reference row format
    case "parquet"          => ParquetPassthroughParser // beyond-reference
    case "pdf"              => PdfParser // beyond-reference (see scaladoc)
    case "zip"              => ZipArchiveParser // beyond-reference container
    case "tar" | "tgz"      => TarArchiveParser // beyond-reference container
    case other              => throw ParseError(s"unsupported file type: $other")
  }

  /** Text formats whose readers stream through Hadoop's decompression
    * codecs transparently — a `.gz`/`.bz2` suffix on these is routable.
    * Container/binary formats (xlsx zip, avro OCF, orc, parquet) carry
    * their own framing; a gzip wrapper there is a packaging error and
    * is refused explicitly rather than handed to a byte parser. */
  private val CompressibleText = Set("csv", "json", "jsonl", "ndjson", "txt", "log")

  /** Full-key dispatch: resolves compound compressed extensions
    * (`x.csv.gz` -> gzip-wrapped csv) before the single-extension rule.
    * Lake drops are routinely gzip'd line data; Spark's text readers
    * decode the codec from the file name, so the inner parser needs no
    * change. NOTE: gzip streams are not splittable — each .gz file is
    * one scan task, so at 100 TB the drop should arrive as many files
    * (which it does: per-part compression is the lake convention). */
  def parserForKey(key: String): RecordParser = {
    val ext = extractFileType(key)
    if (ext == "gz" || ext == "bz2") {
      val inner = extractFileType(key.substring(0, key.length - ext.length - 1))
      if (inner == "tar" && ext == "gz") TarArchiveParser // handles its own gzip
      else if (CompressibleText(inner)) parserFor(inner)
      else throw ParseError(
        s"unsupported compressed file type: $inner.$ext (only line-oriented " +
          s"text formats ${CompressibleText.toSeq.sorted.mkString("/")} route through a codec wrapper)")
    } else parserFor(ext)
  }
}
