package graft.sinks

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Unit contracts for the BSON codec and OP_MSG framing under the
  * MongoDB wire sink — exercised without Spark or sockets so failures
  * localize to the byte layer, not the pipeline. */
class MongoWireSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("BSON round-trips every supported JSON shape") {
    val json = """{"s":"héllo","i":42,"l":9999999999,"d":1.5,"t":true,"f":false,
                  |"z":null,"o":{"a":1,"b":"x"},"arr":["p",2,{"q":3}]}""".stripMargin
    val node = mapper.readTree(json)
    val decoded = Bson.decodeDocument(
      ByteBuffer.wrap(Bson.encodeDocument(node)).order(ByteOrder.LITTLE_ENDIAN))
    assert(decoded == node)
  }

  test("BSON integral width: int32 when it fits, int64 when it doesn't") {
    val node = mapper.readTree("""{"small":7,"big":2147483648}""")
    val bytes = Bson.encodeDocument(node)
    // element tags appear before their key names
    def tagOf(key: String): Byte = {
      val keyBytes = (key + "\u0000").getBytes("UTF-8")
      val at = bytes.indexOfSlice(keyBytes)
      assert(at > 0, s"key $key not found")
      bytes(at - 1)
    }
    assert(tagOf("small") == 0x10)
    assert(tagOf("big") == 0x12)
  }

  test("BSON document length prefix matches the byte count") {
    val bytes = Bson.encodeDocument(mapper.readTree("""{"a":{"b":[1,2,3]}}"""))
    val declared = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt
    assert(declared == bytes.length)
  }

  test("OP_MSG insert parses back to (db, collection, docs)") {
    val out = new ByteArrayOutputStream()
    val replyIn = new ByteArrayOutputStream()
    // hand-build a reply stream for insertMany to read
    val ack = mapper.createObjectNode()
    ack.put("n", 2); ack.put("ok", 1.0)
    replyIn.write(MongoWire.reply(responseTo = 1, ack))
    val n = MongoWire.insertMany(
      new DataOutputStream(out),
      new DataInputStream(new ByteArrayInputStream(replyIn.toByteArray)),
      "db1", "coll1", Seq("""{"x":1}""", """{"x":2}"""))
    assert(n == 2)
    val (db, coll, docs) = MongoWire.parseInsert(out.toByteArray)
    assert(db == "db1" && coll == "coll1")
    assert(docs.map(_.get("x").asInt()) == Seq(1, 2))
  }

  test("reply with ok=0 raises DatabaseError with the server message") {
    val replyIn = new ByteArrayOutputStream()
    val err = mapper.createObjectNode()
    err.put("ok", 0.0); err.put("errmsg", "boom")
    replyIn.write(MongoWire.reply(responseTo = 1, err))
    val ex = intercept[graft.domain.IngestionError.DatabaseError](
      MongoWire.insertMany(
        new DataOutputStream(new ByteArrayOutputStream()),
        new DataInputStream(new ByteArrayInputStream(replyIn.toByteArray)),
        "db", "c", Seq("""{"x":1}""")))
    assert(ex.getMessage.contains("boom"))
  }

  test("reply n excludes errored docs; tolerant mode re-counts duplicates") {
    // MongoDB's insert reply contract: n counts inserted docs only, so a
    // 3-doc batch with one duplicate-key rejection acks n=2.
    def run(tolerate: Boolean): Long = {
      val replyIn = new ByteArrayOutputStream()
      val ack = mapper.readTree(
        """{"n":2,"ok":1.0,"writeErrors":[{"index":1,"code":11000,"errmsg":"dup"}]}""")
      replyIn.write(MongoWire.reply(responseTo = 1, ack))
      MongoWire.insertMany(
        new DataOutputStream(new ByteArrayOutputStream()),
        new DataInputStream(new ByteArrayInputStream(replyIn.toByteArray)),
        "db", "c", Seq("""{"x":1}""", """{"x":2}""", """{"x":3}"""),
        tolerateDuplicates = tolerate)
    }
    assert(run(tolerate = false) == 2) // dup is not newly written
    assert(run(tolerate = true) == 3)  // dup is already durable -> counts
  }

  test("stub rejects duplicate _id like a real unique index") {
    val server = new StubMongoServer
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        assert(MongoWire.insertMany(out, in, "db", "c", Seq("""{"_id":"a","v":1}""")) == 1)
        // plain mode: the redelivered doc is not newly written
        assert(MongoWire.insertMany(out, in, "db", "c", Seq("""{"_id":"a","v":1}""")) == 0)
        // idempotent mode: already-durable counts as written
        assert(MongoWire.insertMany(out, in, "db", "c", Seq("""{"_id":"a","v":1}"""),
          tolerateDuplicates = true) == 1)
        assert(server.docs("db", "c").size == 1, "no duplicate stored")
      } finally sock.close()
    } finally server.stop()
  }

  test("find returns the stored collection through a cursor firstBatch") {
    val server = new StubMongoServer
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        MongoWire.insertMany(out, in, "db", "cfg",
          Seq("""{"pattern":"a","target_table":"t1"}""", """{"pattern":"b","target_table":"t2"}"""))
        val found = MongoWire.find(out, in, "db", "cfg")
        assert(found.map(_.get("target_table").asText()) == Seq("t1", "t2"))
        assert(MongoWire.find(out, in, "db", "empty").isEmpty)
      } finally sock.close()
    } finally server.stop()
  }

  test("MongoConfigRepository loads rules (incl. parser_config) over the wire") {
    import graft.rules.MongoConfigRepository
    val server = new StubMongoServer
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try MongoWire.insertMany(
        new java.io.DataOutputStream(sock.getOutputStream),
        new java.io.DataInputStream(sock.getInputStream),
        "ingestion_db", "ingestion_config", Seq(
          """{"pattern": ".*\\.csv$", "target_table": "csv_data"}""",
          """{"pattern": ".*special\\.csv$", "target_table": "special",
            | "parser_config": {"headers": ["a", "b"], "delimiter": ";",
            |   "has_headers": false, "sheet_index": 2}}""".stripMargin))
      finally sock.close()
      val repo = new MongoConfigRepository(server.host, server.port, "ingestion_db")
      assert(repo.allRules.size == 2)
      // longest-wins, exactly like the in-memory matcher
      val best = repo.findBestMatch("data/special.csv").get
      assert(best.targetTable == "special")
      val pc = best.parserConfig.get
      assert(pc.headers.contains(Seq("a", "b")))
      assert(pc.delimiter.contains(";") && pc.hasHeaders.contains(false)
        && pc.sheetIndex.contains(2))
      assert(repo.findBestMatch("data/other.csv").get.targetTable == "csv_data")
      assert(repo.findBestMatch("nope.xyz").isEmpty)
    } finally server.stop()
  }

  test("updateById patches the matched doc; unknown _id matches 0") {
    val server = new StubMongoServer
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        MongoWire.insertMany(out, in, "db", "logs",
          Seq("""{"_id":"L1","status":"Started","end_time":null}"""))
        assert(MongoWire.updateById(out, in, "db", "logs", "L1",
          """{"status":"Success","end_time":"2026-01-01T00:00:00Z"}""") == 1)
        assert(MongoWire.updateById(out, in, "db", "logs", "nope", """{"status":"x"}""") == 0)
        val doc = mapper.readTree(MongoWire.find(out, in, "db", "logs").head.toString)
        assert(doc.get("status").asText() == "Success")
        assert(doc.get("end_time").asText() == "2026-01-01T00:00:00Z")
      } finally sock.close()
    } finally server.stop()
  }

  test("MongoLogRepository: audit lifecycle over the wire; unknown id raises") {
    import java.sql.Timestamp
    import graft.domain.{IngestionError, IngestionLog, IngestionStatus}
    val server = new StubMongoServer
    try {
      val repo = new MongoLogRepository(server.host, server.port, "ingestion_db",
        idGen = fn => s"log-$fn")
      val id = repo.insertLog(IngestionLog("", "data/t.csv",
        Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z")),
        None, "Started", None))
      assert(id == "log-data/t.csv")
      repo.updateLog(id, Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:05Z")),
        IngestionStatus.Success, Some("3 rows"))
      val stored = mapper.readTree(server.docs("ingestion_db", "ingestion_logs").head)
      assert(stored.get("_id").asText() == id)
      assert(stored.get("status").asText() == "Success")
      assert(stored.get("message").asText() == "3 rows")
      assert(stored.get("end_time").asText() == "2026-01-01T00:00:05Z")
      intercept[IngestionError.DatabaseError](
        repo.updateLog("unknown", Timestamp.from(java.time.Instant.now()),
          IngestionStatus.Failed, None))
    } finally server.stop()
  }

  test("stub server stores docs and acknowledges over a real socket") {
    val server = new StubMongoServer
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val n = MongoWire.insertMany(
          new DataOutputStream(sock.getOutputStream),
          new DataInputStream(sock.getInputStream),
          "ingestion_db", "events", Seq("""{"k":"a","v":1}""", """{"k":"b","v":2}"""))
        assert(n == 2)
      } finally sock.close()
      val stored = server.docs("ingestion_db", "events").map(mapper.readTree)
      assert(stored.map(_.get("k").asText()) == Seq("a", "b"))
      assert(stored.map(_.get("v").asInt()) == Seq(1, 2))
    } finally server.stop()
  }

  // ---- SCRAM-SHA-256 ----

  test("SCRAM derivation reproduces the RFC 7677 test vector exactly") {
    // RFC 7677 §3: user "user", pass "pencil", fixed nonces. Pinning the
    // published vector proves interop with ANY conforming server, not
    // just our stub agreeing with our client.
    val clientFirstBare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
    val serverFirst =
      "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val d = Scram.deriveClient("pencil", clientFirstBare, serverFirst)
    assert(d.clientFinal ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(d.serverSignatureB64 == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // and the server-side verifier accepts exactly that proof
    val salt = java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val cred = Scram.credential("pencil", salt, 4096)
    assert(Scram.verifyClientFinal(cred, clientFirstBare, serverFirst, d.clientFinal)
      .contains("v=" + d.serverSignatureB64))
    assert(Scram.verifyClientFinal(cred, clientFirstBare, serverFirst,
      d.clientFinal.dropRight(5) + "AAAA=").isEmpty)
  }

  test("SCRAM username escaping and SASLprep normalization") {
    assert(Scram.escapeUsername("a=b,c") == "a=3Db=2Cc")
    assert(Scram.saslPrep("pen cil") == "pen cil") // NBSP -> space
    assert(Scram.saslPrep("pen­cil") == "pencil")  // soft hyphen removed
    assert(Scram.saslPrep("Ⅸ") == "IX")            // NFKC roman numeral
    intercept[IllegalArgumentException](Scram.saslPrep("pencil"))
  }

  test("authenticated wire round-trip: login, insert, reject bad password") {
    val server = new StubMongoServer
    server.requireAuth("ingest_user", "s3cret")
    try {
      // happy path: saslStart/saslContinue then a working insert
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val out = new DataOutputStream(sock.getOutputStream)
        val in = new DataInputStream(sock.getInputStream)
        MongoWire.authenticate(out, in, "admin", "ingest_user", "s3cret")
        val n = MongoWire.insertMany(out, in, "db", "c", Seq("""{"x":1}"""))
        assert(n == 1)
      } finally sock.close()
      assert(server.docs("db", "c").nonEmpty)

      // wrong password: server refuses at the proof leg
      val sock2 = new java.net.Socket(server.host, server.port)
      try {
        val e = intercept[graft.domain.IngestionError.DatabaseError](
          MongoWire.authenticate(
            new DataOutputStream(sock2.getOutputStream),
            new DataInputStream(sock2.getInputStream),
            "admin", "ingest_user", "wrong"))
        assert(e.getMessage.contains("Authentication failed"))
      } finally sock2.close()
    } finally server.stop()
  }

  test("auth-required stub rejects unauthenticated commands with code 13") {
    val server = new StubMongoServer
    server.requireAuth("u", "p")
    try {
      val sock = new java.net.Socket(server.host, server.port)
      try {
        val e = intercept[graft.domain.IngestionError.DatabaseError](
          MongoWire.insertMany(
            new DataOutputStream(sock.getOutputStream),
            new DataInputStream(sock.getInputStream),
            "db", "c", Seq("""{"x":1}""")))
        assert(e.getMessage.contains("requires authentication"))
      } finally sock.close()
    } finally server.stop()
  }

  test("client rejects a server whose ServerSignature is forged") {
    // A fake endpoint that accepts any proof but cannot compute
    // HMAC(ServerKey, AuthMessage) must NOT be trusted with writes —
    // build its replies by hand and watch the client walk away.
    val salt = Array.fill[Byte](16)(7)
    val cred = Scram.credential("pw", salt, 4096)
    val clientNonce = "fixedClientNonce"
    val serverFirst = Scram.serverFirstMessage(clientNonce + "srvAdds", cred)

    val r1 = mapper.createObjectNode()
    r1.put("conversationId", 1); r1.put("done", false)
    r1.put("payload", serverFirst.getBytes("UTF-8")); r1.put("ok", 1.0)
    val r2 = mapper.createObjectNode()
    r2.put("conversationId", 1); r2.put("done", true)
    r2.put("payload", "v=Zm9yZ2VkIHNpZ25hdHVyZQ==".getBytes("UTF-8")); r2.put("ok", 1.0)
    val replies = new ByteArrayOutputStream()
    replies.write(MongoWire.reply(1, r1))
    replies.write(MongoWire.reply(2, r2))

    val e = intercept[graft.domain.IngestionError.DatabaseError](
      MongoWire.authenticate(
        new DataOutputStream(new ByteArrayOutputStream()),
        new DataInputStream(new ByteArrayInputStream(replies.toByteArray)),
        "admin", "u", "pw", clientNonce = Some(clientNonce)))
    assert(e.getMessage.contains("signature mismatch"))
  }

  test("authenticated MongoDbSink writes partitions after per-connection login") {
    val spark = graft.GraftSession.local(cores = 8, shufflePartitions = 8)
    val server = new StubMongoServer
    server.requireAuth("writer", "wr1te-pw")
    try {
      import spark.implicits._
      val df = (1 to 20).map(i => (i, s"doc$i")).toDF("n", "name").repartition(4)
      val sink = new MongoDbSink(server.host, server.port, "ingestion_db",
        credential = Some(MongoCredential("writer", "wr1te-pw")))
      assert(sink.write(df, "authed") == 20L)
      assert(server.docs("ingestion_db", "authed").size == 20)
      // and without credentials the same write is refused
      val bare = new MongoDbSink(server.host, server.port, "ingestion_db")
      val e = intercept[org.apache.spark.SparkException](bare.write(df, "authed2"))
      assert(e.getMessage.contains("requires authentication") ||
        Option(e.getCause).exists(_.getMessage.contains("requires authentication")))
    } finally server.stop()
  }
}
