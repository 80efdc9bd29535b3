package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

/** Minimal BSON codec (bsonspec.org) between Jackson trees and bytes —
  * just the element types a JSON document round-trip needs: double
  * (0x01), string (0x02), document (0x03), array (0x04), boolean
  * (0x08), null (0x0A), int32 (0x10), int64 (0x12). Integral numbers
  * encode as the smallest of int32/int64 (the same rule MongoDB
  * drivers apply to JSON numbers). Everything here is little-endian
  * per the spec.
  *
  * This is the document layer under the OP_MSG wire sink
  * (reference: src/infrastructure/mongodb/data_repo.rs:20-70 converts
  * serde_json::Value -> bson::Document the same way before
  * insert_many).
  */
object Bson {

  private val nodes = JsonNodeFactory.instance

  // ---- encode ----

  def encodeDocument(doc: JsonNode): Array[Byte] = {
    require(doc.isObject, s"BSON document root must be an object, got ${doc.getNodeType}")
    val body = new ByteArrayOutputStream()
    doc.properties().forEach { e => writeElement(body, e.getKey, e.getValue) }
    frame(body.toByteArray)
  }

  private def encodeArray(arr: ArrayNode): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    var i = 0
    arr.forEach { v => writeElement(body, i.toString, v); i += 1 }
    frame(body.toByteArray)
  }

  /** int32 total length (incl. itself and trailing NUL) + body + 0x00. */
  private def frame(body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + body.length + 1).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(4 + body.length + 1).put(body).put(0.toByte)
    out.array()
  }

  private def writeElement(out: ByteArrayOutputStream, name: String, v: JsonNode): Unit = {
    def tag(t: Int): Unit = { out.write(t); writeCString(out, name) }
    v match {
      case _ if v.isBinary =>
        // binData subtype 0 (generic) — SASL payloads ride here; length
        // counts the payload only, not the subtype byte (bsonspec.org).
        tag(0x05)
        val bytes = v.binaryValue()
        writeInt32(out, bytes.length)
        out.write(0) // subtype
        out.write(bytes, 0, bytes.length)
      case _ if v.isTextual =>
        tag(0x02)
        val bytes = v.textValue().getBytes(UTF_8)
        writeInt32(out, bytes.length + 1)
        out.write(bytes); out.write(0)
      case _ if v.isIntegralNumber && v.canConvertToInt =>
        tag(0x10); writeInt32(out, v.intValue())
      case _ if v.isIntegralNumber && v.canConvertToLong =>
        tag(0x12); writeInt64(out, v.longValue())
      case _ if v.isIntegralNumber => // BigInteger beyond int64: refuse rather
        // than silently rounding through double (the write would corrupt
        // exact decimal(38,0) aggregates this codebase produces)
        throw new IllegalArgumentException(
          s"integral value for '$name' exceeds int64: ${v.asText()}")
      case _ if v.isNumber =>
        tag(0x01); writeInt64(out, java.lang.Double.doubleToLongBits(v.doubleValue()))
      case _ if v.isBoolean =>
        tag(0x08); out.write(if (v.booleanValue()) 1 else 0)
      case _ if v.isNull =>
        tag(0x0A)
      case o: ObjectNode =>
        tag(0x03); out.writeBytes(encodeDocument(o))
      case a: ArrayNode =>
        tag(0x04); out.writeBytes(encodeArray(a))
      case other =>
        throw new IllegalArgumentException(s"unsupported BSON value for '$name': ${other.getNodeType}")
    }
  }

  private def writeCString(out: ByteArrayOutputStream, s: String): Unit = {
    val bytes = s.getBytes(UTF_8)
    require(!bytes.contains(0.toByte), s"BSON key may not contain NUL: $s")
    out.write(bytes, 0, bytes.length); out.write(0)
  }

  private def writeInt32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def writeInt64(out: ByteArrayOutputStream, v: Long): Unit = {
    writeInt32(out, v.toInt); writeInt32(out, (v >>> 32).toInt)
  }

  // ---- decode ----

  /** Decodes one document from the buffer's current position (must be
    * little-endian ordered); leaves the position just past it. */
  def decodeDocument(buf: ByteBuffer): ObjectNode = {
    val start = buf.position()
    val len = buf.getInt()
    val doc = nodes.objectNode()
    while (buf.get(buf.position()) != 0) {
      val t = buf.get()
      val name = readCString(buf)
      doc.set[JsonNode](name, readValue(buf, t))
    }
    buf.get() // trailing NUL
    require(buf.position() - start == len, s"BSON document length mismatch: declared $len, read ${buf.position() - start}")
    doc
  }

  private def readValue(buf: ByteBuffer, t: Byte): JsonNode = t match {
    case 0x01 => nodes.numberNode(java.lang.Double.longBitsToDouble(buf.getLong()))
    case 0x02 =>
      val len = buf.getInt()
      val bytes = new Array[Byte](len - 1)
      buf.get(bytes); buf.get() // NUL
      nodes.textNode(new String(bytes, UTF_8))
    case 0x03 => decodeDocument(buf)
    case 0x04 =>
      val obj = decodeDocument(buf)
      val arr = nodes.arrayNode()
      obj.properties().forEach(e => arr.add(e.getValue): Unit)
      arr
    // 0x05/0x09/0x11 never originate from this codec's writes, but real
    // replica-set / DocumentDB servers attach $clusterTime (0x11
    // timestamp), operationTime and dates (0x09) and binData (0x05) to
    // every command reply — decode them leniently so the client survives
    // a real server, not just the stub.
    case 0x05 =>
      val len = buf.getInt()
      buf.get() // subtype
      val bytes = new Array[Byte](len)
      buf.get(bytes)
      nodes.binaryNode(bytes) // JSON-serializes as base64, binaryValue() is lossless
    case 0x08 => nodes.booleanNode(buf.get() != 0)
    case 0x09 => nodes.numberNode(buf.getLong()) // UTC datetime, epoch millis
    case 0x0A => nodes.nullNode()
    case 0x10 => nodes.numberNode(buf.getInt())
    case 0x11 => nodes.numberNode(buf.getLong()) // internal BSON timestamp
    case 0x12 => nodes.numberNode(buf.getLong())
    case other => throw new IllegalArgumentException(f"unsupported BSON element type 0x$other%02x")
  }

  private def readCString(buf: ByteBuffer): String = {
    val out = new ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { out.write(b); b = buf.get() }
    new String(out.toByteArray, UTF_8)
  }
}
