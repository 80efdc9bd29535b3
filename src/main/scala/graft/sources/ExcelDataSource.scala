package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.parsers.ExcelParser

/** DataSource V2 for XLSX: `spark.read.format("xlsx").load(pathOrDir)`.
  *
  * The hand-rolled sheet reader (ExcelParser, reference semantics:
  * excel_parser.rs — first sheet, header row, stringified cells, overflow
  * dropped) moves into partition readers: ONE PARTITION PER FILE, because
  * an XLSX zip container is not splittable — file granularity is exactly
  * the parallelism a 10k-spreadsheet ingest needs, while the driver only
  * lists paths and infers the schema from the first file.
  *
  * Files with differing headers project into the inferred schema BY
  * COLUMN NAME (missing columns -> null, extra columns dropped) — the
  * DSv2 upgrade over driver-side parse-one-file.
  *
  * Options: `sheetIndex` (default 0).
  */
class ExcelDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xlsx"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ExcelDataSource.listFiles(options.get("path"))
    require(files.nonEmpty, s"no .xlsx files at ${options.get("path")}")
    val sheetIndex = Option(options.get("sheetIndex")).map(_.toInt).getOrElse(0)
    ExcelParser.readSheet(files.head.toString, sheetIndex) match {
      case headers :: _ => StructType(headers.map(h => StructField(h, StringType, nullable = true)))
      case Nil => StructType(Nil)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // properties arrive case-preserved; options are case-insensitive by
    // DSv2 convention (inferSchema already reads them that way)
    val opts = new CaseInsensitiveStringMap(properties)
    new ExcelTable(schema, opts.get("path"),
      Option(opts.get("sheetIndex")).map(_.toInt).getOrElse(0))
  }
}

object ExcelDataSource {
  def listFiles(path: String): Seq[Path] = {
    val p = Paths.get(if (path.startsWith("file:")) path.stripPrefix("file:") else path)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(_.toString.toLowerCase.endsWith(".xlsx")).toSeq.sortBy(_.toString)
      finally stream.close()
    } else Seq(p)
  }
}

final class ExcelTable(schema: StructType, path: String, sheetIndex: Int)
    extends Table with SupportsRead {
  override def name(): String = s"xlsx:$path"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        ExcelDataSource.listFiles(path)
          .map(f => ExcelFilePartition(f.toString, sheetIndex): InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new ExcelReaderFactory(schema)
    }
  override def schema(): StructType = schema
}

final case class ExcelFilePartition(file: String, sheetIndex: Int) extends InputPartition

final class ExcelReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ExcelFilePartition]
    new PartitionReader[InternalRow] {
      // per-partition parse; executor-local, never on the driver
      private val rows: Iterator[InternalRow] =
        ExcelParser.readSheet(p.file, p.sheetIndex) match {
          case Nil => Iterator.empty
          case fileHeaders :: data =>
            // project by NAME into the table schema
            val idx: Array[Int] = schema.fieldNames.map(fileHeaders.indexOf(_))
            data.iterator.map { cells =>
              InternalRow.fromSeq(idx.map { i =>
                if (i >= 0 && i < cells.size && cells(i) != null) UTF8String.fromString(cells(i))
                else null
              }.toSeq)
            }
        }
      private var current: InternalRow = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
