package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.domain.ParserConfig
import graft.ports.RecordParser

/** CSV scan with the reference's semantics (reference:
  * src/infrastructure/parsers/csv_parser.rs:1-67):
  *   - every field is a STRING (no schema inference; csv_parser.rs:55);
  *   - headers come from the first row, or from `config.headers` (then the
  *     first row is data; csv_parser.rs:14-22);
  *   - when config headers are supplied and data rows are wider, the extra
  *     fields get fallback names `column_{i}` (csv_parser.rs:52-57);
  *   - ragged rows (width differing from the schema) are an error — the
  *     reference used the csv crate's strict mode (csv_parser.rs:22), here
  *     mode=FAILFAST;
  *   - `delimiter` from ParserConfig is honored (dead config in the
  *     reference, migration.js:9-12 — deliberate improvement).
  *
  * Scale note: Spark's CSV scan is splittable; a 1 TB file becomes ~8000
  * parallel tasks instead of one 1 TB buffer (the reference buffered whole
  * files in RAM, s3_adapter.rs:39-49).
  */
object CsvParser extends RecordParser {

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame = {
    val delimiter = config.flatMap(_.delimiter).getOrElse(",")
    val customHeaders = config.flatMap(_.headers)
    val hasHeaders = config.flatMap(_.hasHeaders).getOrElse(customHeaders.isEmpty)

    customHeaders match {
      case Some(headers) =>
        // Width of the widest row decides how many column_{i} overflow
        // names we need. One cheap pass over the first rows is enough when
        // the file is well-formed (FAILFAST rejects ragged rows anyway),
        // so probe the header/first line only.
        val width = probeWidth(spark, path, delimiter)
        val names = headers ++ (headers.size until width).map(i => s"column_$i")
        val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
        spark.read
          .option("header", hasHeaders.toString) // headers supplied: first row is data unless told otherwise
          .option("delimiter", delimiter)
          .option("mode", "FAILFAST")
          .schema(schema)
          .csv(path)
      case None =>
        spark.read
          .option("header", hasHeaders.toString)
          .option("delimiter", delimiter)
          .option("inferSchema", "false") // all-strings, matching csv_parser.rs:55
          .option("mode", "FAILFAST")
          .csv(path)
    }
  }

  /** Field count of the first line — determines overflow column_{i} names.
    * Reads one line only (limit(1) prunes the scan). Quote-aware: a quoted
    * field containing the delimiter (`"a,b",c`) counts as ONE field, so the
    * probed width matches what the CSV scan will actually parse. */
  private def probeWidth(spark: SparkSession, path: String, delimiter: String): Int = {
    val first = spark.read.textFile(path).limit(1).collect()
    if (first.isEmpty) 0
    else countFields(first.head, delimiter)
  }

  /** RFC-4180 field count: delimiters inside double-quoted fields don't
    * split; `""` inside a quoted field is an escaped quote, not a close. */
  private[parsers] def countFields(line: String, delimiter: String): Int = {
    var count = 1
    var i = 0
    var inQuotes = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') i += 1 // escaped ""
          else inQuotes = false
        }
      } else {
        if (c == '"') inQuotes = true
        else if (line.startsWith(delimiter, i)) { count += 1; i += delimiter.length - 1 }
      }
      i += 1
    }
    count
  }
}
