package graft.sources

import java.io.File
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 write path for the Avro OCF source — the engine both reads AND
  * produces the lake's row-exchange format. Executor-parallel: each
  * input partition streams its rows through an Avro block writer into
  * its own `part-<pid>-<tid>.avro`, written to a dot-prefixed temp name
  * and renamed on task commit (rename is the atomic unit, so a failed /
  * speculative task never leaves a half-file visible); job abort deletes
  * any committed parts. `mode("overwrite")` maps to SupportsTruncate,
  * which clears prior `part-*.avro` at job commit time.
  *
  * Schema mapping is the exact inverse of AvroConversions.toSparkType,
  * so a write->read round trip is type-identical (including date /
  * timestamp-micros / decimal logical types); unsupported Spark types
  * (CalendarInterval, Variant, ...) are refused at planning time.
  */
object AvroWriteSupport {

  final case class PartFile(name: String) extends WriterCommitMessage

  final class AvroWriteBuilder(path: String, info: LogicalWriteInfo)
      extends WriteBuilder with SupportsTruncate {
    private var doTruncate = false
    override def truncate(): WriteBuilder = { doTruncate = true; this }
    override def build(): Write = new Write {
      override def toBatch: BatchWrite = new AvroBatchWrite(path, info.schema(), doTruncate)
    }
  }

  final class AvroBatchWrite(path: String, schema: StructType, doTruncate: Boolean)
      extends BatchWrite {
    // planning-time schema validation: fail before launching tasks
    sparkToAvro(schema, "topLevelRecord")

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new AvroWriterFactory(path, schema)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val dir = Paths.get(path)
      Files.createDirectories(dir)
      val committed = messages.collect { case PartFile(n) => n }.toSet
      if (doTruncate) { // overwrite: drop pre-existing parts, keep ours
        val stream = Files.list(dir)
        try stream.iterator().asScala
          .filter { p =>
            val n = p.getFileName.toString
            n.endsWith(".avro") && !committed.contains(n)
          }
          .toList.foreach(Files.delete)
        finally stream.close()
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.collect { case PartFile(n) => n }
        .foreach(n => Files.deleteIfExists(Paths.get(path, n)))
  }

  final class AvroWriterFactory(path: String, schema: StructType)
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new DataWriter[InternalRow] {
        private val avroSchema = sparkToAvro(schema, "topLevelRecord")
        private val name = f"part-$partitionId%05d-$taskId.avro"
        private val tmp = new File(path, s".$name.inprogress")
        private val writer = {
          new File(path).mkdirs()
          val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
          w.create(avroSchema, tmp)
          w
        }
        private val convert = recordConverter(schema, avroSchema)

        override def write(row: InternalRow): Unit = writer.append(convert(row))
        override def commit(): WriterCommitMessage = {
          writer.close()
          Files.move(tmp.toPath, Paths.get(path, name),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          PartFile(name)
        }
        override def abort(): Unit = { writer.close(); Files.deleteIfExists(tmp.toPath) }
        override def close(): Unit = ()
      }
  }

  /** Spark -> Avro schema (inverse of AvroConversions.toSparkType). */
  def sparkToAvro(dt: DataType, recordName: String): AvroSchema = dt match {
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case LongType => AvroSchema.create(AvroSchema.Type.LONG)
    case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
    case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case StringType => AvroSchema.create(AvroSchema.Type.STRING)
    case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
    case st: StructType =>
      val b = SchemaBuilder.record(recordName).fields()
      st.fields.foldLeft(b) { (acc, f) =>
        val fieldSchema = {
          val s = sparkToAvro(f.dataType, s"${recordName}_${f.name}")
          if (f.nullable) AvroSchema.createUnion(
            AvroSchema.create(AvroSchema.Type.NULL), s)
          else s
        }
        if (f.nullable) acc.name(f.name).`type`(fieldSchema).withDefault(null)
        else acc.name(f.name).`type`(fieldSchema).noDefault()
      }.endRecord()
    case ArrayType(et, containsNull) =>
      val el = sparkToAvro(et, s"${recordName}_item")
      AvroSchema.createArray(
        if (containsNull) AvroSchema.createUnion(
          AvroSchema.create(AvroSchema.Type.NULL), el)
        else el)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = sparkToAvro(vt, s"${recordName}_value")
      AvroSchema.createMap(
        if (valueContainsNull) AvroSchema.createUnion(
          AvroSchema.create(AvroSchema.Type.NULL), v)
        else v)
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for Avro write: $other")
  }

  private def nonNull(s: AvroSchema): AvroSchema =
    if (s.getType == AvroSchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).get
    else s

  /** Compiles an InternalRow -> GenericRecord converter. */
  def recordConverter(schema: StructType, avro: AvroSchema): InternalRow => GenericRecord = {
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      (i, f.name, fieldConverter(f.dataType, nonNull(avro.getField(f.name).schema())))
    }
    row => {
      val rec = new GenericData.Record(avro)
      fields.foreach { case (i, name, conv) =>
        rec.put(name, if (row.isNullAt(i)) null else conv(row, i))
      }
      rec
    }
  }

  /** Accessor+converter from a row/array slot to the Avro runtime value. */
  private def fieldConverter(dt: DataType, avro: AvroSchema):
      (org.apache.spark.sql.catalyst.expressions.SpecializedGetters, Int) => Any = dt match {
    case BooleanType => (r, i) => r.getBoolean(i)
    case ByteType => (r, i) => r.getByte(i).toInt
    case ShortType => (r, i) => r.getShort(i).toInt
    case IntegerType | DateType => (r, i) => r.getInt(i)
    case LongType | TimestampType => (r, i) => r.getLong(i)
    case FloatType => (r, i) => r.getFloat(i)
    case DoubleType => (r, i) => r.getDouble(i)
    case StringType => (r, i) => r.getUTF8String(i).toString
    case BinaryType => (r, i) => ByteBuffer.wrap(r.getBinary(i))
    case d: DecimalType => (r, i) =>
      ByteBuffer.wrap(r.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.unscaledValue().toByteArray)
    case st: StructType =>
      val conv = recordConverter(st, avro)
      (r, i) => conv(r.getStruct(i, st.size))
    case ArrayType(et, _) =>
      val el = fieldConverter(et, nonNull(avro.getElementType))
      (r, i) => {
        val arr: ArrayData = r.getArray(i)
        val out = new java.util.ArrayList[Any](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null else el(arr, j))
          j += 1
        }
        out
      }
    case MapType(StringType, vt, _) =>
      val vc = fieldConverter(vt, nonNull(avro.getValueType))
      (r, i) => {
        val m: MapData = r.getMap(i)
        val keys = m.keyArray(); val vals = m.valueArray()
        val out = new java.util.HashMap[String, Any](m.numElements())
        var j = 0
        while (j < m.numElements()) {
          out.put(keys.getUTF8String(j).toString,
            if (vals.isNullAt(j)) null else vc(vals, j))
          j += 1
        }
        out
      }
    case other =>
      throw new IllegalArgumentException(s"unsupported Spark type for Avro write: $other")
  }
}
