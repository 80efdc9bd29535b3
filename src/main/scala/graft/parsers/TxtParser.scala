package graft.parsers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.domain.ParserConfig
import graft.ports.RecordParser

/** TXT scan (reference: src/infrastructure/parsers/txt_parser.rs:4-28):
  * each line becomes `{line_number: 1-based int, content: string}`.
  *
  * Line numbering must be deterministic per file. `spark.read.text` splits
  * a file into partitions ordered by byte offset, and
  * `monotonically_increasing_id()` is ordered within and across those
  * partitions (partition index occupies the high bits), so
  * row_number() over (partition by file order by id) reproduces exact
  * 1-based per-file numbering without collecting to the driver. The window
  * shuffle partitions by file name — at scale each file's lines land on
  * one reducer, which is the price of a total per-file ordering; files
  * themselves parallelize.
  */
object TxtParser extends RecordParser {

  override def parse(spark: SparkSession, path: String, config: Option[ParserConfig]): DataFrame = {
    val w = Window.partitionBy(input_file_name()).orderBy(monotonically_increasing_id())
    spark.read.text(path)
      .select(
        row_number().over(w).as("line_number"),
        col("value").as("content"))
  }
}
