package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord, GenericRecordBuilder}

import graft.SparkSpec

/** The hand-rolled Avro OCF DSv2 source: type mapping, nullable unions,
  * logical types, nested/array/map values, sync-split correctness, and
  * decoder-level column pruning. */
class AvroDataSourceSpec extends SparkSpec {

  private def write(p: Path, schema: Schema, syncInterval: Int = 1 << 20)(
      recs: Iterator[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(syncInterval)
    w.create(schema, p.toFile)
    recs.foreach(w.append)
    w.close()
  }

  private val flat: Schema = SchemaBuilder.record("Row").fields()
    .requiredString("name")
    .requiredInt("n")
    .requiredLong("big")
    .requiredDouble("x")
    .requiredBoolean("ok")
    .optionalString("note") // [null, string] union
    .endRecord()

  private def flatRec(name: String, n: Int, note: Option[String]): GenericRecord =
    new GenericRecordBuilder(flat)
      .set("name", name).set("n", n).set("big", n.toLong * 10)
      .set("x", n / 2.0).set("ok", n % 2 == 0)
      .set("note", note.orNull).build()

  test("primitives + nullable union round-trip with native types") {
    val dir = Files.createTempDirectory("avro_flat")
    write(dir.resolve("a.avro"), flat)(
      Iterator(flatRec("Alice", 1, Some("hi")), flatRec("Bob", 2, None)))
    val df = spark.read.format("avro").load(dir.resolve("a.avro").toString)
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) == Seq(
      ("name", "string"), ("n", "integer"), ("big", "long"),
      ("x", "double"), ("ok", "boolean"), ("note", "string")))
    assert(df.schema("note").nullable)
    val rows = df.orderBy("n").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("Alice", "Bob"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(10L, 20L))
    assert(rows(0).getString(5) == "hi" && rows(1).isNullAt(5))
  }

  test("logical types: date, timestamp-micros, timestamp-millis, decimal") {
    val s = SchemaBuilder.record("L").fields()
      .name("d").`type`(LogicalTypes.date().addToSchema(
        Schema.create(Schema.Type.INT))).noDefault()
      .name("tmu").`type`(LogicalTypes.timestampMicros().addToSchema(
        Schema.create(Schema.Type.LONG))).noDefault()
      .name("tms").`type`(LogicalTypes.timestampMillis().addToSchema(
        Schema.create(Schema.Type.LONG))).noDefault()
      .name("dec").`type`(LogicalTypes.decimal(10, 2).addToSchema(
        Schema.create(Schema.Type.BYTES))).noDefault()
      .endRecord()
    val unscaled = java.math.BigInteger.valueOf(12345) // 123.45
    val rec = new GenericRecordBuilder(s)
      .set("d", 19000) // epoch day
      .set("tmu", 1700000000000000L)
      .set("tms", 1700000000123L)
      .set("dec", ByteBuffer.wrap(unscaled.toByteArray))
      .build()
    val dir = Files.createTempDirectory("avro_logical")
    write(dir.resolve("l.avro"), s)(Iterator(rec))
    val df = spark.read.format("avro").load(dir.resolve("l.avro").toString)
    assert(df.schema.map(_.dataType.simpleString) == Seq(
      "date", "timestamp", "timestamp", "decimal(10,2)"))
    val r = df.selectExpr(
      "cast(d as string)", "unix_micros(tmu)", "unix_micros(tms)", "cast(dec as string)")
      .collect()(0)
    assert(r.getString(0) == java.time.LocalDate.ofEpochDay(19000).toString)
    assert(r.getLong(1) == 1700000000000000L)
    assert(r.getLong(2) == 1700000000123000L) // millis scaled to micros
    assert(r.getString(3) == "123.45")
  }

  test("nested record, array, map, enum, fixed") {
    val inner = SchemaBuilder.record("Inner").fields()
      .requiredString("k").requiredInt("v").endRecord()
    val s = SchemaBuilder.record("N").fields()
      .name("rec").`type`(inner).noDefault()
      .name("xs").`type`().array().items().intType().noDefault()
      .name("m").`type`().map().values().longType().noDefault()
      .name("e").`type`().enumeration("Color").symbols("RED", "GREEN").noDefault()
      .name("f").`type`().fixed("F4").size(4).noDefault()
      .endRecord()
    val rec = new GenericRecordBuilder(s)
      .set("rec", new GenericRecordBuilder(inner).set("k", "a").set("v", 7).build())
      .set("xs", java.util.List.of(1, 2, 3))
      .set("m", java.util.Map.of("one", 1L, "two", 2L))
      .set("e", new GenericData.EnumSymbol(s.getField("e").schema(), "GREEN"))
      .set("f", new GenericData.Fixed(s.getField("f").schema(), Array[Byte](1, 2, 3, 4)))
      .build()
    val dir = Files.createTempDirectory("avro_nested")
    write(dir.resolve("n.avro"), s)(Iterator(rec))
    val df = spark.read.format("avro").load(dir.resolve("n.avro").toString)
    val r = df.selectExpr("rec.k", "rec.v", "xs[2]", "m['two']", "e", "hex(f)").collect()(0)
    assert((r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getString(4), r.getString(5))
      == ("a", 7, 3, 2L, "GREEN", "01020304"))
  }

  test("sync-marker splits partition the file with no gap and no overlap") {
    val dir = Files.createTempDirectory("avro_split")
    val p = dir.resolve("big.avro")
    // small sync interval -> many blocks, so byte-range splits cut mid-file
    write(p, flat, syncInterval = 1024)(
      (0 until 20000).iterator.map(i => flatRec(s"u$i", i, None)))
    val len = Files.size(p)
    assert(len > 64 * 1024, s"fixture too small to split meaningfully: $len")
    val df = spark.read.format("avro")
      .option("maxSplitBytes", (len / 7 + 1).toString).load(p.toString)
    assert(df.rdd.getNumPartitions == 7, "file fans out into 7 range splits")
    assert(df.count() == 20000, "every row read exactly once across splits")
    assert(df.agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
      == (0 until 20000).map(_.toLong).sum)
  }

  test("column pruning reaches the Avro decoder (narrow reader schema)") {
    val dir = Files.createTempDirectory("avro_prune")
    write(dir.resolve("a.avro"), flat)(
      (0 until 100).iterator.map(i => flatRec(s"u$i", i, None)))
    val df = spark.read.format("avro").load(dir.resolve("a.avro").toString)
      .select("name", "n")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq == Seq("name", "n"),
      s"scan output should be pruned to the projection, got ${scan.schema.fieldNames.toSeq}")
    assert(df.count() == 100)
  }

  test("multi-branch unions are refused, not stringified") {
    val s = SchemaBuilder.record("U").fields()
      .name("u").`type`().unionOf().intType().and().stringType().endUnion().noDefault()
      .endRecord()
    val rec = new GenericRecordBuilder(s).set("u", 5).build()
    val dir = Files.createTempDirectory("avro_union")
    write(dir.resolve("u.avro"), s)(Iterator(rec))
    val e = intercept[Exception] {
      spark.read.format("avro").load(dir.resolve("u.avro").toString).collect()
    }
    assert(e.getMessage.contains("union") ||
      Option(e.getCause).exists(_.getMessage.contains("union")))
  }

  test("write path: executor-parallel OCF write, read-back round trip is type-identical") {
    val dir = Files.createTempDirectory("avro_write").resolve("out")
    val src = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text", "lang",
        "cast(n_chars as int) as n32",
        "cast(doc_id % 3 = 0 as boolean) as flag",
        "named_struct('a', doc_id, 'b', lang) as nested",
        "array(doc_id, doc_id + 1) as xs",
        "map('k', lang) as m",
        "cast(cast(doc_id as string) as decimal(12,2)) as dec",
        "date'2024-03-01' + cast(doc_id % 28 as int) as d",
        "timestamp'2024-03-01 12:00:00' + make_interval(0,0,0,0,0,0,doc_id % 59) as ts")
      .repartition(3)
    src.write.format("avro").mode("append").save(dir.toString)
    val files = AvroDataSource.listFiles(dir.toString)
    assert(files.size == 3, s"one part per partition, got ${files.map(_.getFileName)}")
    assert(files.forall(_.getFileName.toString.startsWith("part-")))
    val back = spark.read.format("avro").load(dir.toString)
    assert(back.schema == src.schema.copy(fields = src.schema.fields.map(f =>
      f.copy(nullable = true))) || back.schema == src.schema,
      s"round-trip schema drift: ${back.schema} vs ${src.schema}")
    assert(back.count() == src.count())
    // full-row equality via anti-joins both ways on a canonical projection
    val canon = (df: org.apache.spark.sql.DataFrame) => df.selectExpr(
      "doc_id", "text", "lang", "n32", "flag", "nested.a", "nested.b",
      "xs[0]", "xs[1]", "m['k']", "cast(dec as string)",
      "cast(d as string)", "cast(ts as string)")
    assert(canon(back).exceptAll(canon(src)).count() == 0)
    assert(canon(src).exceptAll(canon(back)).count() == 0)
  }

  test("overwrite truncates prior parts; append accumulates") {
    val dir = Files.createTempDirectory("avro_modes").resolve("out")
    val df = spark.range(10).selectExpr("id", "cast(id as string) as s").coalesce(1)
    df.write.format("avro").mode("append").save(dir.toString)
    df.write.format("avro").mode("append").save(dir.toString)
    assert(spark.read.format("avro").load(dir.toString).count() == 20)
    df.write.format("avro").mode("overwrite").save(dir.toString)
    assert(spark.read.format("avro").load(dir.toString).count() == 10)
    assert(AvroDataSource.listFiles(dir.toString).size == 1)
  }

  test("pipeline dispatch routes .avro through the rule-matched ingest path") {
    assert(graft.parsers.ParserDispatch.parserFor("avro") eq graft.parsers.AvroParser)
  }
}
