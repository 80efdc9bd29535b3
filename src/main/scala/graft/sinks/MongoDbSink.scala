package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.DataFrame
import graft.domain.IngestionError.DatabaseError
import graft.ports.DataSink

/** MongoDB/DocumentDB wire sink: bulk-inserts each partition's rows
  * over the BSON wire protocol (OP_MSG, opcode 2013) — the reference's
  * default deployed path (reference:
  * src/infrastructure/mongodb/data_repo.rs:20-70 `insert_many`;
  * documentdb/data_repo.rs:18-44 is byte-identical on the wire, both
  * speak the MongoDB protocol). The target TABLE names the collection,
  * exactly as the reference passes `target_table` to
  * `database.collection(...)`; `log_id` rides along as a column the
  * pipeline's enrich step already added (the reference injected it
  * per-doc, data_repo.rs:33-35).
  *
  * Wire shape per batch: one OP_MSG with a kind-0 section carrying the
  * `{insert, $db, ordered}` command document and a kind-1 section
  * streaming the documents under the `"documents"` identifier — the
  * document-sequence form drivers use for bulk writes, which avoids
  * embedding N docs inside one command document. The reply's kind-0
  * body carries `{n, ok, writeErrors?}`; `ok != 1` raises, per-doc
  * `writeErrors` subtract from the written count (the same
  * partial-failure accounting the CouchDB sink applies to `_bulk_docs`
  * entries).
  *
  * Spark-first shape, like CouchDbSink: rows serialize via the
  * codegen'd `toJSON`, each PARTITION opens ONE connection from the
  * executor it lives on and streams its batches over it — no driver
  * funnel, and at 1000 executors the server sees 1000 connections, not
  * one per batch. Batches close on COUNT or BYTE budget, whichever
  * trips first (JSON length as the BSON-size proxy), so both a 10M-row
  * partition of tiny rows and a 100-row partition of 1 MB documents
  * stay under MongoDB's 48 MB message cap.
  */
final class MongoDbSink(host: String, port: Int, database: String,
                        batchSize: Int = 1000,
                        batchBytes: Long = 16L * 1024 * 1024,
                        deterministicIdColumns: Seq[String] = Nil,
                        credential: Option[MongoCredential] = None) extends DataSink {

  /** With `deterministicIdColumns` set, every row gets
    * `_id = md5(to_json(struct(cols)))` and duplicate-key rejections
    * (code 11000 on the unique _id index) count as already-durable
    * rather than failures — so an at-least-once redelivery (SQS's
    * delivery contract, which the reference simply double-inserts
    * under) re-writes a file IDEMPOTENTLY: same rows, same ids, no
    * duplicates, full rowsWritten reported. The chosen columns must
    * uniquely identify a row (e.g. file_name + line_number); collisions
    * would deduplicate legitimate repeats. */
  override def write(df: DataFrame, targetTable: String): Long = {
    val (h, p, db, maxDocs, maxBytes) = (host, port, database, batchSize, batchBytes)
    val creds = credential // capture the case class, not `this`, in the task closure
    val keyed =
      if (deterministicIdColumns.isEmpty) df
      else df.withColumn("_id", org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct(
            deterministicIdColumns.map(df.col): _*))))
    val tolerant = deterministicIdColumns.nonEmpty
    keyed.toJSON.rdd
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.single(0L)
        else MongoWire.withConnection(h, p, soTimeoutMs = 120000) { (out, in) =>
          creds.foreach(c => MongoWire.authenticate(out, in, c.authDb, c.user, c.password))
          var total = 0L
          val batch = scala.collection.mutable.ArrayBuffer.empty[String]
          var bytes = 0L
          def flush(): Unit = if (batch.nonEmpty) {
            total += MongoWire.insertMany(out, in, db, targetTable, batch.toSeq,
              tolerateDuplicates = tolerant)
            batch.clear(); bytes = 0L
          }
          rows.foreach { doc =>
            if (batch.nonEmpty && (batch.size >= maxDocs || bytes + doc.length > maxBytes))
              flush()
            batch += doc; bytes += doc.length
          }
          flush()
          Iterator.single(total)
        }
      }
      .fold(0L)(_ + _)
  }
}

/** SCRAM login identity for the Mongo/DocumentDB wire — user/password
  * plus the database the user is defined in (MongoDB's `authSource`,
  * "admin" for the root users the reference's deployment provisions).
  * Serializable by construction: executor partitions authenticate
  * their own connections. */
final case class MongoCredential(user: String, password: String,
                                 authDb: String = "admin")

/** OP_MSG framing shared by the sink (client side) and StubMongoServer
  * (server side). Public protocol layout: 16-byte message header
  * (messageLength, requestID, responseTo, opCode — all int32 LE), then
  * for OP_MSG a uint32 flagBits and one or more sections: kind 0 is a
  * single BSON document, kind 1 is (int32 size, cstring identifier,
  * BSON documents back-to-back). */
object MongoWire {

  val OpMsg = 2013
  private val mapper = new ObjectMapper()
  private val requestIds = new AtomicInteger(0)

  /** Sends one kind-0 command document and returns the reply body,
    * raising on `ok != 1` with the server's errmsg. */
  def runCommand(out: DataOutputStream, in: DataInputStream,
                 cmd: JsonNode, what: String): JsonNode = {
    val cmdBytes = Bson.encodeDocument(cmd)
    val bodyLen = 4 + 1 + cmdBytes.length
    val buf = ByteBuffer.allocate(16 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(16 + bodyLen).putInt(requestIds.incrementAndGet()).putInt(0).putInt(OpMsg)
    buf.putInt(0).put(0.toByte).put(cmdBytes)
    out.write(buf.array()); out.flush()
    val body = firstDocument(readMessage(in)._2)
    val ok = Option(body.get("ok")).exists(_.asDouble() == 1.0)
    if (!ok) {
      val msg = Option(body.get("errmsg")).map(_.asText()).getOrElse(body.toString)
      throw DatabaseError(s"$what failed: $msg")
    }
    body
  }

  /** SCRAM-SHA-256 login over saslStart/saslContinue — run once per
    * connection, BEFORE any data command, exactly as MongoDB drivers
    * do on socket open. Verifies the ServerSignature on the final leg
    * (mutual auth): a server that accepts the proof but cannot produce
    * `v=` does not know the credential, and trusting it would hand a
    * fake endpoint every document in the partition. `clientNonce` is
    * injectable for deterministic tests; production path draws from
    * SecureRandom. */
  def authenticate(out: DataOutputStream, in: DataInputStream,
                   authDb: String, user: String, password: String,
                   clientNonce: Option[String] = None): Unit = {
    val nonce = clientNonce.getOrElse {
      val b = new Array[Byte](18)
      new java.security.SecureRandom().nextBytes(b)
      java.util.Base64.getEncoder.encodeToString(b)
    }
    val firstBare = Scram.clientFirstBare(user, nonce)
    val start = mapper.createObjectNode()
    start.put("saslStart", 1)
    start.put("mechanism", "SCRAM-SHA-256")
    start.put("payload", (Scram.Gs2Header + firstBare).getBytes(UTF_8))
    start.set[JsonNode]("options",
      mapper.createObjectNode().put("skipEmptyExchange", true))
    start.put("$db", authDb)
    val r1 = runCommand(out, in, start, s"saslStart as '$user'")
    val convId = r1.path("conversationId").asInt()
    val serverFirst = new String(r1.get("payload").binaryValue(), UTF_8)

    val derived = Scram.deriveClient(password, firstBare, serverFirst)
    val cont = mapper.createObjectNode()
    cont.put("saslContinue", 1)
    cont.put("conversationId", convId)
    cont.put("payload", derived.clientFinal.getBytes(UTF_8))
    cont.put("$db", authDb)
    var reply = runCommand(out, in, cont, s"saslContinue as '$user'")
    val serverFinal = new String(reply.get("payload").binaryValue(), UTF_8)
    if (!Scram.parseAttributes(serverFinal).get('v')
        .contains(derived.serverSignatureB64))
      throw DatabaseError(
        s"SCRAM server signature mismatch for '$user' — endpoint does not hold this credential")
    // Servers without skipEmptyExchange close with one empty round.
    if (!reply.path("done").asBoolean(false)) {
      val fin = mapper.createObjectNode()
      fin.put("saslContinue", 1)
      fin.put("conversationId", convId)
      fin.put("payload", Array.emptyByteArray)
      fin.put("$db", authDb)
      reply = runCommand(out, in, fin, s"saslContinue (final) as '$user'")
      if (!reply.path("done").asBoolean(false))
        throw DatabaseError(s"SASL conversation for '$user' never completed")
    }
  }

  /** One TCP connection wrapped in data streams, closed on exit — the
    * shared connect/timeout/cleanup shape for every wire client (sink
    * partitions, config find, log writes). */
  def withConnection[A](host: String, port: Int, connectTimeoutMs: Int = 10000,
                        soTimeoutMs: Int = 30000)
                       (f: (DataOutputStream, DataInputStream) => A): A = {
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    sock.setSoTimeout(soTimeoutMs)
    try f(new DataOutputStream(sock.getOutputStream),
      new DataInputStream(sock.getInputStream))
    finally sock.close()
  }

  /** Sends one `insert` command with the docs as a kind-1 `documents`
    * sequence; returns the number of docs the server acknowledged
    * (reply `n` minus per-doc `writeErrors`). With `tolerateDuplicates`
    * the batch goes `ordered: false` (the server attempts every doc)
    * and duplicate-key rejections (code 11000) count as written — the
    * idempotent-redelivery mode. */
  def insertMany(out: DataOutputStream, in: DataInputStream,
                 db: String, collection: String, docsJson: Seq[String],
                 tolerateDuplicates: Boolean = false): Long = {
    val cmd = mapper.createObjectNode()
    cmd.put("insert", collection)
    cmd.put("$db", db)
    cmd.put("ordered", !tolerateDuplicates)
    val cmdBytes = Bson.encodeDocument(cmd)
    val docBytes = docsJson.map(j => Bson.encodeDocument(mapper.readTree(j)))
    val ident = "documents".getBytes(UTF_8)
    val seqSize = 4 + ident.length + 1 + docBytes.map(_.length).sum
    val bodyLen = 4 + (1 + cmdBytes.length) + (1 + seqSize)

    val buf = ByteBuffer.allocate(16 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(16 + bodyLen).putInt(requestIds.incrementAndGet()).putInt(0).putInt(OpMsg)
    buf.putInt(0) // flagBits
    buf.put(0.toByte).put(cmdBytes) // kind 0: command
    buf.put(1.toByte).putInt(seqSize).put(ident).put(0.toByte) // kind 1 header
    docBytes.foreach(buf.put)
    out.write(buf.array()); out.flush()

    val reply = readMessage(in)._2
    val body = firstDocument(reply)
    val ok = Option(body.get("ok")).exists(_.asDouble() == 1.0)
    if (!ok) {
      val msg = Option(body.get("errmsg")).map(_.asText()).getOrElse(body.toString)
      throw DatabaseError(s"insert into $db.$collection failed: $msg")
    }
    // Reply `n` counts INSERTED docs only — writeErrors are already
    // excluded from it (MongoDB insert reply contract), so the accepted
    // count is n as-is; in idempotent mode duplicate-key rejections
    // (code 11000) are already-durable rows and count as written.
    val n = Option(body.get("n")).map(_.asLong()).getOrElse(0L)
    var nDup = 0L
    Option(body.get("writeErrors")).foreach(_.forEach { e =>
      if (e.path("code").asInt() == 11000) nDup += 1
    })
    n + (if (tolerateDuplicates) nDup else 0L)
  }

  /** Reads one wire message; returns (requestID, full message bytes). */
  def readMessage(in: DataInputStream): (Int, Array[Byte]) = {
    val lenBytes = new Array[Byte](4)
    in.readFully(lenBytes)
    val len = ByteBuffer.wrap(lenBytes).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(len >= 16 && len < 64 * 1024 * 1024, s"implausible wire message length $len")
    val msg = new Array[Byte](len)
    System.arraycopy(lenBytes, 0, msg, 0, 4)
    in.readFully(msg, 4, len - 4)
    val reqId = ByteBuffer.wrap(msg, 4, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    (reqId, msg)
  }

  /** The kind-0 section's BSON document from a full OP_MSG message. */
  def firstDocument(msg: Array[Byte]): JsonNode = {
    val buf = ByteBuffer.wrap(msg).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(16) // past header
    val opCode = ByteBuffer.wrap(msg, 12, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    require(opCode == OpMsg, s"expected OP_MSG ($OpMsg), got $opCode")
    buf.getInt // flagBits (checksum bit never set by this codebase)
    val kind = buf.get()
    require(kind == 0, s"expected kind-0 section first, got $kind")
    Bson.decodeDocument(buf)
  }

  /** Sends a `find` (empty filter — the reference's config lookup scans
    * the whole collection, config_repo.rs:30) and returns the reply
    * cursor's firstBatch. The stub always answers the full collection in
    * one batch (cursor id 0), matching small control-plane collections;
    * a paging getMore loop is not needed for that shape. */
  def find(out: DataOutputStream, in: DataInputStream,
           db: String, collection: String): Seq[JsonNode] = {
    val cmd = mapper.createObjectNode()
    cmd.put("find", collection)
    cmd.put("$db", db)
    cmd.set[JsonNode]("filter", mapper.createObjectNode())
    val cmdBytes = Bson.encodeDocument(cmd)
    val bodyLen = 4 + 1 + cmdBytes.length
    val buf = ByteBuffer.allocate(16 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(16 + bodyLen).putInt(requestIds.incrementAndGet()).putInt(0).putInt(OpMsg)
    buf.putInt(0).put(0.toByte).put(cmdBytes)
    out.write(buf.array()); out.flush()
    val body = firstDocument(readMessage(in)._2)
    val ok = Option(body.get("ok")).exists(_.asDouble() == 1.0)
    if (!ok) {
      val msg = Option(body.get("errmsg")).map(_.asText()).getOrElse(body.toString)
      throw DatabaseError(s"find on $db.$collection failed: $msg")
    }
    val batch = body.path("cursor").path("firstBatch")
    val docs = Seq.newBuilder[JsonNode]
    batch.forEach(d => docs += d)
    docs.result()
  }

  /** Sends an `update` command targeting one document by `_id` with a
    * `$set` patch — the reference's log-completion write
    * (log_repo.rs:49-88 update_one on `{_id}` with
    * `{$set: {end_time, status, message}}`). Returns the matched count
    * (`n`); the caller decides whether 0 is an error, as the reference
    * does. */
  def updateById(out: DataOutputStream, in: DataInputStream,
                 db: String, collection: String, id: String, setJson: String): Long = {
    val cmd = mapper.createObjectNode()
    cmd.put("update", collection)
    cmd.put("$db", db)
    cmd.put("ordered", true)
    val q = mapper.createObjectNode(); q.put("_id", id)
    val u = mapper.createObjectNode(); u.set[JsonNode]("$set", mapper.readTree(setJson))
    val one = mapper.createObjectNode()
    one.set[JsonNode]("q", q); one.set[JsonNode]("u", u)
    cmd.set[JsonNode]("updates", mapper.createArrayNode().add(one))
    val cmdBytes = Bson.encodeDocument(cmd)
    val bodyLen = 4 + 1 + cmdBytes.length
    val buf = ByteBuffer.allocate(16 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(16 + bodyLen).putInt(requestIds.incrementAndGet()).putInt(0).putInt(OpMsg)
    buf.putInt(0).put(0.toByte).put(cmdBytes)
    out.write(buf.array()); out.flush()
    val body = firstDocument(readMessage(in)._2)
    val ok = Option(body.get("ok")).exists(_.asDouble() == 1.0)
    if (!ok) {
      val msg = Option(body.get("errmsg")).map(_.asText()).getOrElse(body.toString)
      throw DatabaseError(s"update on $db.$collection failed: $msg")
    }
    Option(body.get("n")).map(_.asLong()).getOrElse(0L)
  }

  /** Parses any OP_MSG command message: (command doc, sequence docs) —
    * kind-1 section docs plus any inline `documents` array. */
  def parseCommand(msg: Array[Byte]): (JsonNode, Seq[JsonNode]) = {
    val buf = ByteBuffer.wrap(msg).order(ByteOrder.LITTLE_ENDIAN)
    val len = buf.getInt; buf.getInt; buf.getInt
    val opCode = buf.getInt
    require(opCode == OpMsg, s"expected OP_MSG ($OpMsg), got $opCode")
    buf.getInt // flagBits
    var cmd: JsonNode = null
    val docs = Seq.newBuilder[JsonNode]
    while (buf.position() < len) {
      buf.get() match {
        case 0 =>
          val d = Bson.decodeDocument(buf)
          if (cmd == null) cmd = d else docs += d
        case 1 =>
          val end = buf.position() + buf.getInt
          while (buf.get() != 0) {} // skip identifier cstring
          while (buf.position() < end) docs += Bson.decodeDocument(buf)
        case other => throw new IllegalArgumentException(s"unknown section kind $other")
      }
    }
    require(cmd != null, "OP_MSG with no kind-0 command section")
    (cmd, docs.result())
  }

  /** Parses an OP_MSG insert: returns ($db, collection, docs). */
  def parseInsert(msg: Array[Byte]): (String, String, Seq[JsonNode]) = {
    val (cmd, seqDocs) = parseCommand(msg)
    require(cmd.has("insert"), s"not an insert command: $cmd")
    val docs = Seq.newBuilder[JsonNode]
    docs ++= seqDocs
    Option(cmd.get("documents")).foreach(_.forEach(d => docs += d))
    (Option(cmd.get("$db")).map(_.asText()).getOrElse(""), cmd.get("insert").asText(), docs.result())
  }

  /** Builds an OP_MSG reply carrying one kind-0 body document. */
  def reply(responseTo: Int, body: JsonNode): Array[Byte] = {
    val bodyBytes = Bson.encodeDocument(body)
    val len = 16 + 4 + 1 + bodyBytes.length
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(len).putInt(requestIds.incrementAndGet()).putInt(responseTo).putInt(OpMsg)
    buf.putInt(0).put(0.toByte).put(bodyBytes)
    buf.array()
  }
}
