package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Parquet layout maintenance — the small-files problem.
  *
  * A streaming ingest (EventLoop appends per batch) or a heavily
  * partitioned write leaves a table directory with thousands of tiny
  * parquet files; at cluster scale every query then pays one task + one
  * open/footer-read per file, and the driver pays listing + split
  * planning over all of them. Compaction rewrites the directory into
  * ~targetBytes files.
  *
  * Scale design: the rewrite is `coalesce(targetFiles)` — a shuffle-free
  * narrow merge of read splits (each output task concatenates input
  * splits; row order within files is not preserved, which parquet tables
  * don't contract anyway). Sizing comes from the file system's byte
  * totals, not from reading data. The swap is write-aside + rename, so a
  * failure mid-compaction leaves the original directory untouched.
  */
object Layout {

  /** What a compaction would do. `needed` when the directory holds more
    * than 1.5x the file count the byte total justifies (hysteresis so
    * near-target layouts aren't churned). */
  case class CompactionPlan(nFiles: Int, totalBytes: Long, targetFiles: Int, needed: Boolean)

  private def dataFiles(spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(s => s.isFile && {
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc")
    })
  }

  def plan(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionPlan = {
    val files = dataFiles(spark, dir)
    val total = files.map(_.getLen).sum
    val target = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    CompactionPlan(files.size, total, target, needed = files.size > target * 3 / 2)
  }

  /** Compacts `dir` in place when the plan says it's needed (or `force`);
    * returns the plan it acted on. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024, force: Boolean = false): CompactionPlan = {
    val p = plan(spark, dir, targetBytes)
    if (!p.needed && !force) return p
    val src = new Path(dir)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(dir + ".compact-tmp")
    fs.delete(tmp, true)
    spark.read.parquet(dir).coalesce(p.targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: the original stays intact until the rewrite has committed
    val bak = new Path(dir + ".compact-old")
    fs.delete(bak, true)
    if (!fs.rename(src, bak)) throw new java.io.IOException(s"rename $src -> $bak failed")
    if (!fs.rename(tmp, src)) {
      fs.rename(bak, src) // restore
      throw new java.io.IOException(s"rename $tmp -> $src failed; original restored")
    }
    fs.delete(bak, true)
    p
  }
}
