package graft.sinks

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener
import graft.ports.DataSink

/** Primary offline-friendly sink: one parquet directory per target table
  * (stand-in for the reference's NoSQL bulk inserts, K1-K3:
  * mongodb/data_repo.rs:20-70, couchdb/data_repo.rs:23-59,
  * documentdb/data_repo.rs:18-44). The reference created collections
  * implicitly on first insert (mongodb/data_repo.rs:28) — append mode with
  * mergeSchema-on-read reproduces that, including accumulating files with
  * different headers into one table.
  *
  * Scale: writes are partition-parallel; the writer never funnels rows
  * through the driver (the reference pushed one whole-file Vec per
  * insert_many). The inserted-row count (the reference's contract:
  * insert_many returns inserted counts) comes from an observed metric on
  * the SAME write job — the plan executes exactly once, never a separate
  * count() pass (at 100 TB a pre-count would be a second full scan).
  */
final class ParquetSink(baseDir: String) extends DataSink {

  private val obsSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def tablePath(targetTable: String): String = s"$baseDir/$targetTable"

  override def write(df: DataFrame, targetTable: String): Long = {
    val spark = df.sparkSession
    // Unique per-call observation name: the listener fires for every
    // action on the session, so it keys off this name to find its write.
    val obsName = s"graft_sink_${targetTable}_${obsSeq.incrementAndGet()}"
    val rows = new AtomicLong(-1L)
    val failure = new AtomicReference[Throwable](null)
    val done = new CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get(obsName).foreach { row =>
          rows.set(row.getLong(0)); done.countDown()
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        if (qe.observedMetrics.contains(obsName) || qe.analyzed.toString.contains(obsName)) {
          failure.set(exception); done.countDown()
        }
    }
    spark.listenerManager.register(listener)
    try {
      df.observe(obsName, count(lit(1)).as("rows_written"))
        .write.mode("append").parquet(tablePath(targetTable))
      // The listener bus is async; the write itself has already committed,
      // we only wait for the metric row to be delivered.
      if (!done.await(120, TimeUnit.SECONDS))
        throw new IllegalStateException(s"observed metric $obsName never delivered")
      if (failure.get() != null) throw failure.get()
      rows.get()
    } finally spark.listenerManager.unregister(listener)
  }
}
