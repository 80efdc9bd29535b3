package graft.runner

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.GraftSession
import graft.domain.FileToProcess
import graft.pipeline.IngestionPipeline
import graft.rules.RuleMatcher
import graft.sinks.{ParquetLogRepository, ParquetSink}
import graft.sources.LocalFileSource

/** Wiring shared by the two entry points (the reference's dependency
  * construction in EcsService::new, ecs_service.rs:23-111). Environment:
  *   GRAFT_BASE_DIR   object-store root (contains <bucket>/<key> files)
  *   GRAFT_SINK_DIR   parquet sink root (one dir per target table)
  *   GRAFT_LOG_DIR    audit-log dir
  */
object Wiring {
  def pipeline(): IngestionPipeline = {
    val base = sys.env.getOrElse("GRAFT_BASE_DIR", "/tmp/graft/objects")
    val sinkDir = sys.env.getOrElse("GRAFT_SINK_DIR", "/tmp/graft/sink")
    val logDir = sys.env.getOrElse("GRAFT_LOG_DIR", "/tmp/graft/logs")
    new IngestionPipeline(
      new LocalFileSource(base),
      new RuleMatcher(RuleMatcher.seedRules),
      new ParquetSink(sinkDir),
      new ParquetLogRepository(logDir))
  }
}

/** One-shot CLI (the reference's documented programmatic API,
  * README.md:140-148): `runMain graft.runner.BatchRunner <bucket> <key>`. */
object BatchRunner {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BatchRunner <bucket> <key>")
    val spark = GraftSession.local()
    val result = Wiring.pipeline().processFile(spark, FileToProcess(args(0), args(1)))
    println(s"ingested ${result.rowsWritten} rows into ${result.targetTable} (log ${result.logId})")
    spark.stop()
  }
}

/** Long-running event loop (the reference's ECS service entry,
  * main.rs:29-32 + ecs_service.rs:113-174): watches GRAFT_EVENT_DIR for
  * S3-notification envelopes and processes every referenced object.
  * At-least-once with a checkpoint (upgrade over the reference's
  * delete-even-on-failure at-most-once). */
object ServiceRunner {
  def main(args: Array[String]): Unit = {
    val eventDir = sys.env.getOrElse("GRAFT_EVENT_DIR", "/tmp/graft/events")
    val ckptDir = sys.env.getOrElse("GRAFT_CHECKPOINT_DIR", "/tmp/graft/ckpt")
    val spark = GraftSession.local()
    val query = new graft.streaming.EventLoop(Wiring.pipeline()).start(
      spark, eventDir, ckptDir,
      trigger = Trigger.ProcessingTime("10 seconds"),
      onResult = {
        case Right(r) => println(s"ok ${r.file.fileName} -> ${r.targetTable} (${r.rowsWritten} rows)")
        case Left((f, e)) => System.err.println(s"FAILED ${f.fileName}: ${e.getMessage}")
      })
    query.awaitTermination()
  }
}
