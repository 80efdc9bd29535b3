package graft.sinks

import graft.ports.DataSink

/** Backend selection, mirroring the reference's DATABASE_TYPE switch
  * (reference: src/ecs_service.rs:57-107 — "documentdb" selects the
  * DocumentDB repositories, anything else falls through to MongoDB;
  * the CouchDB repository exists in its infrastructure but was never
  * wired into the selector).
  *
  * Here the wire-protocol backend is CouchDB (`_bulk_docs` is plain
  * HTTP+JSON, implementable and testable offline); MongoDB and
  * DocumentDB speak the BSON wire protocol, which has no offline stub in
  * this environment, so both select the parquet stand-in that preserves
  * the bulk-insert contract (documented stand-in, same append+count
  * semantics). The selector accepts an env map rather than reading
  * sys.env directly so tests and drivers inject configuration.
  */
object SinkFactory {

  /** env keys, matching the reference's template.yaml names. */
  val DatabaseType = "DATABASE_TYPE"
  val CouchDbUrl = "COUCHDB_URL"

  def fromEnv(env: Map[String, String], parquetBaseDir: String): DataSink =
    env.getOrElse(DatabaseType, "mongodb") match { // default: ecs_service.rs:57
      case "couchdb" =>
        new CouchDbSink(env.getOrElse(CouchDbUrl, "http://localhost:5984"))
      case _ => // "mongodb" | "documentdb" | unknown -> stand-in (see scaladoc)
        new ParquetSink(parquetBaseDir)
    }
}
