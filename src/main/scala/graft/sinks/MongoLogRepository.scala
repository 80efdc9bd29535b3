package graft.sinks

import java.io.{DataInputStream, DataOutputStream}
import java.sql.Timestamp
import com.fasterxml.jackson.databind.ObjectMapper
import graft.domain.{IngestionError, IngestionLog}
import graft.ports.LogRepository

/** Audit log over the MongoDB wire — the reference's log repository
  * (reference: src/infrastructure/mongodb/log_repo.rs:21-47 insert into
  * `ingestion_logs`; :49-88 update_one on `{_id}` with
  * `{$set: {end_time, status, message}}`, raising when matched_count is
  * 0). Like the reference's Rust driver, the `_id` is generated
  * CLIENT-side before insert (an injectable `idGen`, md5-of-file-name in
  * gate queries for determinism, UUID in prod). Timestamps serialize as
  * ISO-8601 strings rather than BSON datetimes — a documented
  * simplification of this codec; ordering and equality semantics are
  * preserved.
  *
  * Control-plane writes (two per file), so one short-lived connection
  * per call is the right shape — no pooling complexity for a
  * 2-round-trip-per-file path.
  */
final class MongoLogRepository(
    host: String, port: Int, database: String,
    idGen: String => String = _ => java.util.UUID.randomUUID().toString,
    credential: Option[MongoCredential] = None)
    extends LogRepository {

  private val mapper = new ObjectMapper()

  private def withWire[A](f: (DataOutputStream, DataInputStream) => A): A =
    MongoWire.withConnection(host, port) { (out, in) =>
      credential.foreach(c => MongoWire.authenticate(out, in, c.authDb, c.user, c.password))
      f(out, in)
    }

  override def insertLog(log: IngestionLog): String = {
    val id = if (log.logId.nonEmpty) log.logId else idGen(log.fileName)
    val doc = mapper.createObjectNode()
    doc.put("_id", id)
    doc.put("file_name", log.fileName)
    doc.put("start_time", log.startTime.toInstant.toString)
    log.endTime match {
      case Some(t) => doc.put("end_time", t.toInstant.toString)
      case None => doc.putNull("end_time")
    }
    doc.put("status", log.status)
    log.message match {
      case Some(m) => doc.put("message", m)
      case None => doc.putNull("message")
    }
    val accepted = withWire { (out, in) =>
      MongoWire.insertMany(out, in, database, "ingestion_logs",
        Seq(mapper.writeValueAsString(doc)))
    }
    if (accepted != 1) // e.g. duplicate _id writeError: an audit record
      // that silently vanished would corrupt the trail — surface it
      throw IngestionError.DatabaseError(
        s"audit log insert for $id not acknowledged (accepted=$accepted)")
    id
  }

  override def updateLog(logId: String, endTime: Timestamp, status: String,
                         message: Option[String]): Unit = {
    val set = mapper.createObjectNode()
    set.put("end_time", endTime.toInstant.toString)
    set.put("status", status)
    message match {
      case Some(m) => set.put("message", m)
      case None => set.putNull("message")
    }
    val matched = withWire { (out, in) =>
      MongoWire.updateById(out, in, database, "ingestion_logs", logId,
        mapper.writeValueAsString(set))
    }
    if (matched == 0) // log_repo.rs:80-84
      throw IngestionError.DatabaseError(s"Log record not found: $logId")
  }
}
