package graft.sinks

import java.sql.Timestamp
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.collection.mutable
import graft.domain.{IngestionLog, IngestionStatus}
import graft.ports.LogRepository

/** Audit-log writer (K4; reference: src/infrastructure/mongodb/log_repo.rs:20-88
  * + port ports.rs:26-30). Single-row control-plane ops — deliberately NOT a
  * Spark job (a 2-row upsert does not need a cluster). Kept in memory and
  * mirrored to a JSONL file so logs survive the session; `snapshot` exposes
  * them as a Dataset for querying alongside data tables.
  *
  * Deviation from the reference, on purpose: the reference only created a
  * log row after config/fetch/parse already succeeded
  * (ingestion_service.rs:93-104), so early failures were never recorded.
  * Here the pipeline logs every attempt. Updating a missing id is an error
  * (log_repo.rs:74-84).
  */
final class ParquetLogRepository(
    logDir: String,
    idGen: String => String = _ => java.util.UUID.randomUUID().toString)
    extends LogRepository {

  private val logs = mutable.LinkedHashMap[String, IngestionLog]()
  Files.createDirectories(Paths.get(logDir))
  private val jsonl = Paths.get(logDir, "ingestion_logs.jsonl")

  override def insertLog(log: IngestionLog): String = synchronized {
    val id = if (log.logId.nonEmpty) log.logId else idGen(log.fileName)
    val row = log.copy(logId = id)
    logs(id) = row
    appendJsonl(row)
    id
  }

  override def updateLog(logId: String, endTime: Timestamp, status: String, message: Option[String]): Unit =
    synchronized {
      val existing = logs.getOrElse(
        logId,
        throw graft.domain.IngestionError.DatabaseError(s"log id not found: $logId"))
      val updated = existing.copy(endTime = Some(endTime), status = status, message = message)
      logs(logId) = updated
      appendJsonl(updated)
    }

  def all: Seq[IngestionLog] = synchronized(logs.values.toSeq)

  def snapshot(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    all.toDF()
  }

  private def appendJsonl(l: IngestionLog): Unit = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"; case c => c.toString
    }
    val line =
      s"""{"log_id":"${esc(l.logId)}","file_name":"${esc(l.fileName)}","start_time":"${l.startTime}",""" +
        s""""end_time":${l.endTime.map(t => "\"" + t + "\"").getOrElse("null")},"status":"${l.status}",""" +
        s""""message":${l.message.map(m => "\"" + esc(m) + "\"").getOrElse("null")}}""" + "\n"
    Files.writeString(jsonl, line, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
