package graft.sinks

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process CouchDB `_bulk_docs` test double. The environment has no
  * network egress and no CouchDB, so the wire sink is exercised against
  * this stub: it accepts `POST /{db}/_bulk_docs`, stores the docs, and
  * answers the protocol's `[{"ok":true,"id":...}, ...]` array — the same
  * surface the reference's repository spoke to
  * (reference: src/infrastructure/couchdb/data_repo.rs:23-59). Lives in
  * main (not test) because the ing11 driver query runs the wire sink
  * end-to-end through graft.Verify.
  *
  * Deterministic ids (`{db}-{seq}`): fine for a stub — the queries that
  * hash-check read-backs project doc FIELDS, not server-assigned ids.
  */
final class StubCouchServer {

  private val mapper = new ObjectMapper()
  private val store = new ConcurrentHashMap[String, java.util.List[String]]()
  private val seq = new AtomicInteger(0)
  private val failNext = new AtomicBoolean(false)

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try handleExchange(ex) finally ex.close()
    })
    s.start()
    s
  }

  def baseUrl: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Docs stored for a database, as JSON strings, in arrival order. */
  def docs(db: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(store.get(db)).map(_.asScala.toSeq).getOrElse(Seq.empty)
  }

  /** Makes the next _bulk_docs request answer HTTP 500 (transient-failure
    * injection for retry/DLQ tests). */
  def failNextRequest(): Unit = failNext.set(true)

  def stop(): Unit = server.stop(0)

  private def handleExchange(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath // /{db}/_bulk_docs
    val parts = path.split("/").filter(_.nonEmpty)
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    if (ex.getRequestMethod != "POST" || parts.length != 2 || parts(1) != "_bulk_docs") {
      respond(ex, 404, """{"error":"not_found"}""")
    } else if (failNext.getAndSet(false)) {
      respond(ex, 500, """{"error":"internal_server_error","reason":"injected"}""")
    } else {
      val db = parts(0)
      val root = mapper.readTree(body)
      val docsNode = root.get("docs")
      if (docsNode == null || !docsNode.isArray) {
        respond(ex, 400, """{"error":"bad_request","reason":"expected {\"docs\":[...]}"}""")
      } else {
        val list = store.computeIfAbsent(db, _ => java.util.Collections.synchronizedList(new java.util.ArrayList[String]()))
        val replies = new StringBuilder("[")
        var first = true
        docsNode.forEach { doc =>
          list.add(mapper.writeValueAsString(doc))
          if (!first) replies.append(',')
          first = false
          replies.append(s"""{"ok":true,"id":"$db-${seq.incrementAndGet()}","rev":"1-stub"}""")
        }
        replies.append(']')
        respond(ex, 201, replies.toString)
      }
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }
}
