package graft.sinks

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentHashMap
import com.fasterxml.jackson.databind.ObjectMapper

/** In-process MongoDB wire-protocol test double. The environment has no
  * network egress and no mongod, so the OP_MSG sink is exercised against
  * this stub: it accepts insert commands over real TCP sockets, decodes
  * the BSON document sequence, stores the docs, and answers the
  * protocol's `{n, ok}` acknowledgement — the same surface the
  * reference's repository spoke to through its driver (reference:
  * src/infrastructure/mongodb/data_repo.rs:20-70). Lives in main (not
  * test) because the ing16 driver query runs the wire sink end-to-end
  * through graft.Verify, like StubCouchServer does for ing11.
  *
  * One thread per connection: executor partitions connect concurrently
  * and each streams its batches over its own socket, so the stub must
  * serve them in parallel to be an honest stand-in.
  */
final class StubMongoServer {

  private val mapper = new ObjectMapper()
  private val store = new ConcurrentHashMap[String, java.util.List[String]]()
  private val reqCount = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var failAtRequest = -1
  @volatile private var running = true
  @volatile private var authUser: String = null
  @volatile private var authCred: Scram.Credential = null

  /** Turns on SCRAM-SHA-256: every connection must complete the SASL
    * exchange before any data command (the real server's
    * `--auth` mode). Salt is derived from the username so the stored
    * credential — and therefore the whole exchange given fixed
    * nonces — is deterministic for tests. */
  def requireAuth(user: String, password: String): Unit = {
    val salt = java.util.Arrays.copyOf(
      Scram.h(s"salt:$user".getBytes(java.nio.charset.StandardCharsets.UTF_8)), 16)
    authUser = user
    authCred = Scram.credential(password, salt, 4096)
  }

  private val server = new ServerSocket(0, 64, java.net.InetAddress.getLoopbackAddress)

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), "stub-mongo-conn")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // server closed
      }
    }
  }, "stub-mongo-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def host: String = "127.0.0.1"
  def port: Int = server.getLocalPort

  /** Docs stored for a `db.collection`, as JSON strings, arrival order. */
  def docs(db: String, collection: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(store.get(s"$db.$collection")).map(_.asScala.toSeq).getOrElse(Seq.empty)
  }

  /** Makes the next request answer `{ok: 0, errmsg: "injected"}` without
    * executing (transient-failure injection for retry/DLQ tests). */
  def failNextRequest(): Unit = failRequest(1)

  /** Fails the n-th upcoming request (1 = next) — lets a test inject a
    * failure MID-write, e.g. batch 2 of a partition, to exercise the
    * partial-write redelivery path. */
  def failRequest(n: Int): Unit = failAtRequest = reqCount.get() + n

  def stop(): Unit = { running = false; server.close() }

  private def serve(sock: Socket): Unit = {
    // SASL is a per-CONNECTION conversation: authentication state lives
    // on this socket's stack, exactly like the real server's session.
    var authenticated = false
    var saslBare: String = null        // client-first-bare, pending verify
    var saslServerFirst: String = null
    var saslSkipEmpty = false
    var saslVerified = false
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    try {
      val in = new DataInputStream(sock.getInputStream)
      val out = new DataOutputStream(sock.getOutputStream)
      while (true) {
        val (reqId, msg) = MongoWire.readMessage(in)
        val body = mapper.createObjectNode()
        if (reqCount.incrementAndGet() == failAtRequest) {
          body.put("ok", 0.0)
          body.put("errmsg", "injected")
          body.put("code", 8) // UnknownError
        } else {
          val (cmd, _) = MongoWire.parseCommand(msg)
          val db = Option(cmd.get("$db")).map(_.asText()).getOrElse("")
          if (cmd.has("saslStart")) {
            val mech = cmd.path("mechanism").asText()
            val payload = new String(cmd.get("payload").binaryValue(), utf8)
            if (authUser == null) {
              body.put("ok", 0.0); body.put("code", 18)
              body.put("errmsg", "Authentication failed: no users configured")
            } else if (mech != "SCRAM-SHA-256") {
              body.put("ok", 0.0); body.put("code", 2) // BadValue
              body.put("errmsg", s"unsupported SASL mechanism $mech")
            } else if (!payload.startsWith(Scram.Gs2Header)) {
              body.put("ok", 0.0); body.put("code", 18)
              body.put("errmsg", "malformed gs2 header")
            } else {
              val bare = payload.substring(Scram.Gs2Header.length)
              val attrs = Scram.parseAttributes(bare)
              if (!attrs.get('n').contains(Scram.escapeUsername(authUser))) {
                body.put("ok", 0.0); body.put("code", 18)
                body.put("errmsg", "Authentication failed.")
              } else {
                // Deterministic server nonce (hash of the client's) so a
                // fixed client nonce makes the WHOLE exchange replayable
                // in tests; a real server draws this randomly.
                val clientNonce = attrs('r')
                val serverNonce = java.util.Base64.getEncoder.encodeToString(
                  java.util.Arrays.copyOf(
                    Scram.h(s"nonce:$clientNonce".getBytes(utf8)), 18))
                saslBare = bare
                saslServerFirst =
                  Scram.serverFirstMessage(clientNonce + serverNonce, authCred)
                saslSkipEmpty =
                  cmd.path("options").path("skipEmptyExchange").asBoolean(false)
                saslVerified = false
                body.put("conversationId", 1)
                body.put("done", false)
                body.put("payload", saslServerFirst.getBytes(utf8))
                body.put("ok", 1.0)
              }
            }
          } else if (cmd.has("saslContinue")) {
            val payload = new String(cmd.get("payload").binaryValue(), utf8)
            if (saslBare == null) {
              body.put("ok", 0.0); body.put("code", 17) // ProtocolError
              body.put("errmsg", "no SASL conversation in progress")
            } else if (payload.isEmpty && saslVerified) {
              authenticated = true // the classic empty closing round
              body.put("conversationId", 1)
              body.put("done", true)
              body.put("payload", Array.emptyByteArray)
              body.put("ok", 1.0)
            } else Scram.verifyClientFinal(authCred, saslBare, saslServerFirst,
                payload) match {
              case Some(serverFinal) =>
                saslVerified = true
                if (saslSkipEmpty) authenticated = true
                body.put("conversationId", 1)
                body.put("done", saslSkipEmpty)
                body.put("payload", serverFinal.getBytes(utf8))
                body.put("ok", 1.0)
              case None =>
                body.put("ok", 0.0); body.put("code", 18) // AuthenticationFailed
                body.put("errmsg", "Authentication failed.")
            }
          } else if (authUser != null && !authenticated) {
            body.put("ok", 0.0); body.put("code", 13) // Unauthorized
            body.put("errmsg",
              s"command ${cmd.fieldNames().next()} requires authentication")
          } else if (cmd.has("insert")) {
            // parseInsert owns the kind-1 + inline `documents` merge rule.
            // Like a real server, the unique _id index rejects duplicate
            // ids with writeError code 11000; reply `n` counts only the
            // docs actually inserted.
            val (_, coll, ds) = MongoWire.parseInsert(msg)
            val list = store.computeIfAbsent(s"$db.$coll",
              _ => java.util.Collections.synchronizedList(new java.util.ArrayList[String]()))
            var inserted = 0
            val errors = mapper.createArrayNode()
            list.synchronized {
              val seen = new scala.collection.mutable.HashSet[String]
              list.forEach { j =>
                val id = mapper.readTree(j).path("_id")
                if (!id.isMissingNode && !id.isNull) seen += id.asText(): Unit
              }
              ds.zipWithIndex.foreach { case (d, i) =>
                val id = d.path("_id")
                if (!id.isMissingNode && !id.isNull && seen.contains(id.asText())) {
                  val e = mapper.createObjectNode()
                  e.put("index", i); e.put("code", 11000)
                  e.put("errmsg", s"E11000 duplicate key: _id ${id.asText()}")
                  errors.add(e): Unit
                } else {
                  if (!id.isMissingNode && !id.isNull) seen += id.asText(): Unit
                  list.add(mapper.writeValueAsString(d))
                  inserted += 1
                }
              }
            }
            body.put("n", inserted)
            if (errors.size() > 0)
              body.set[com.fasterxml.jackson.databind.JsonNode]("writeErrors", errors)
            body.put("ok", 1.0)
          } else if (cmd.has("update")) {
            // update_one-by-_id with $set, the reference's log-completion
            // write; unknown _id -> n=0 matched (client raises, like the
            // reference's matched_count==0 arm, log_repo.rs:80-84).
            val coll = cmd.get("update").asText()
            val list = store.get(s"$db.$coll")
            var matched = 0
            Option(cmd.get("updates")).foreach(_.forEach { one =>
              val wantId = one.path("q").path("_id").asText()
              val patch = one.path("u").path("$set")
              if (list != null) list.synchronized {
                var i = 0
                while (i < list.size()) {
                  val doc = mapper.readTree(list.get(i)).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
                  if (doc.path("_id").asText() == wantId) {
                    patch.properties().forEach(e =>
                      doc.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue))
                    list.set(i, mapper.writeValueAsString(doc))
                    matched += 1
                  }
                  i += 1
                }
              }
            })
            body.put("n", matched)
            body.put("nModified", matched)
            body.put("ok", 1.0)
          } else if (cmd.has("find")) {
            // Whole collection in one batch, cursor id 0 (no paging) —
            // the reference's config lookup finds with an empty filter.
            val coll = cmd.get("find").asText()
            val batch = mapper.createArrayNode()
            docs(db, coll).foreach(j => batch.add(mapper.readTree(j)))
            val cursor = mapper.createObjectNode()
            cursor.set[com.fasterxml.jackson.databind.JsonNode]("firstBatch", batch)
            cursor.put("id", 0L)
            cursor.put("ns", s"$db.$coll")
            body.set[com.fasterxml.jackson.databind.JsonNode]("cursor", cursor)
            body.put("ok", 1.0)
          } else {
            body.put("ok", 0.0)
            body.put("errmsg", s"unsupported command: ${cmd.fieldNames().next()}")
            body.put("code", 59) // CommandNotFound
          }
        }
        out.write(MongoWire.reply(reqId, body)); out.flush()
      }
    } catch {
      case _: EOFException | _: SocketException => // client closed
    } finally sock.close()
  }
}
