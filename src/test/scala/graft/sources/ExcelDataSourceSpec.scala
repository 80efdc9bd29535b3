package graft.sources

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec

class ExcelDataSourceSpec extends SparkSpec {

  private def writeXlsx(p: java.nio.file.Path, rows: Seq[Seq[String]]): Unit = {
    val zout = new ZipOutputStream(Files.newOutputStream(p))
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        rows.zipWithIndex.map { case (cells, r) =>
          s"""<row r="${r + 1}">""" + cells.zipWithIndex.map { case (v, c) =>
            val ref = ('A' + c).toChar.toString + (r + 1)
            s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
          }.mkString + "</row>"
        }.mkString + "</sheetData></worksheet>"
    entry("xl/workbook.xml", """<?xml version="1.0"?><workbook/>""")
    entry("xl/worksheets/sheet1.xml", sheet)
    zout.close()
  }

  test("format(\"xlsx\"): single file read with inferred all-string schema") {
    val dir = Files.createTempDirectory("xlsx_dsv2")
    writeXlsx(dir.resolve("a.xlsx"), Seq(Seq("name", "age"), Seq("Alice", "28"), Seq("Bob", "31")))
    val df = spark.read.format("xlsx").load(dir.resolve("a.xlsx").toString)
    assert(df.schema.fieldNames.toSeq == Seq("name", "age"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    assert(df.count() == 2)
    assert(df.filter("name = 'Alice' AND age = '28'").count() == 1)
  }

  test("directory read: one partition per file; by-name projection across differing headers") {
    val dir = Files.createTempDirectory("xlsx_dsv2_dir")
    writeXlsx(dir.resolve("a.xlsx"), Seq(Seq("name", "age"), Seq("Alice", "28")))
    writeXlsx(dir.resolve("b.xlsx"), Seq(Seq("age", "name"), Seq("31", "Bob"))) // swapped order
    writeXlsx(dir.resolve("c.xlsx"), Seq(Seq("name"), Seq("Carol")))            // missing column
    val df = spark.read.format("xlsx").load(dir.toString)
    assert(df.rdd.getNumPartitions == 3, "one partition per file")
    val rows = df.collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(rows == Set(("Alice", Some("28")), ("Bob", Some("31")), ("Carol", None)))
  }

  test("sheetIndex option selects the worksheet") {
    val dir = Files.createTempDirectory("xlsx_dsv2_sheets")
    val p = dir.resolve("m.xlsx")
    val zout = new ZipOutputStream(Files.newOutputStream(p))
    def entry(name: String, content: String): Unit = {
      zout.putNextEntry(new ZipEntry(name)); zout.write(content.getBytes("UTF-8")); zout.closeEntry()
    }
    def sheet(h: String, v: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>$h</t></is></c></row><row r="2"><c r="A2" t="inlineStr"><is><t>$v</t></is></c></row></sheetData></worksheet>"""
    entry("xl/workbook.xml", """<?xml version="1.0"?><workbook/>""")
    entry("xl/worksheets/sheet1.xml", sheet("first", "f1"))
    entry("xl/worksheets/sheet2.xml", sheet("second", "s1"))
    zout.close()
    val df = spark.read.format("xlsx").option("sheetIndex", "1").load(p.toString)
    assert(df.schema.fieldNames.toSeq == Seq("second"))
    assert(df.head().getString(0) == "s1")
  }
}
