package graft.sinks

import org.apache.spark.sql.DataFrame
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
  * insert_many). For a real NoSQL target this port would be implemented
  * with foreachPartition + a connection pool per executor.
  */
final class ParquetSink(baseDir: String) extends DataSink {

  def tablePath(targetTable: String): String = s"$baseDir/$targetTable"

  override def write(df: DataFrame, targetTable: String): Long = {
    val n = df.count()
    df.write.mode("append").parquet(tablePath(targetTable))
    n
  }
}
