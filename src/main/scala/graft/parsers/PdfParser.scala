package graft.parsers

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.domain.ParserConfig
import graft.ops.Pdf
import graft.ports.RecordParser

/** PDF scan: `{page: 1-based int, text: string}` rows via the pure-JVM
  * extractor in [[graft.ops.Pdf]] (classic xref + FlateDecode subset;
  * everything else refuses with an instructive ParseError).
  *
  * The reference ADVERTISES PDF (instructions.md:8, dev-test.sh:109-168)
  * but its adapter just errors (parser_adapter.rs:54-57) — this closes
  * the one advertised format a real user uploads and loses. Like the
  * XLSX container (ExcelParser), a PDF is a bounded whole-file format:
  * a driver-side parse feeding createDataFrame is the right scale
  * trade-off for the ingest path, and many-files workloads distribute
  * at the FILE grain (one task per document) exactly as the multimodal
  * decoders do.
  */
object PdfParser extends RecordParser {

  private val schema = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("text", StringType, nullable = true)))

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame = {
    val localPath = if (path.startsWith("file:")) path.stripPrefix("file:") else path
    val bytes = Files.readAllBytes(Paths.get(localPath))
    val rows = Pdf.extract(bytes).map(p => Row(p.page, p.text))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }
}
