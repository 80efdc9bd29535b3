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

  /** SQL for a 2-dim Morton (Z-order) key over two already-quantized
    * non-negative ints (`bits` bits each): bit j of each input lands at
    * position 2j / 2j+1, so keys close in z-order are close in BOTH
    * dims. Plain shift/mask arithmetic — codegen-friendly in Spark and
    * runnable verbatim by DuckDB (shared operator subset). */
  def zkeySql(aCol: String, bCol: String, bits: Int = 16): String = {
    // cast to bigint FIRST: bit 15 of an int32 input would shift into
    // position 31 — the int sign bit — wrapping half the keyspace
    // negative in Spark (and erroring in DuckDB)
    val (a, b) = (s"cast($aCol as bigint)", s"cast($bCol as bigint)")
    (0 until bits).map { j =>
      s"((($a >> $j) & 1) << ${2 * j}) + ((($b >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Rewrites `df` into `dir` Z-ordered on two numeric dimensions:
    * quantize each dim to `bits` bits by min-max scaling, interleave to
    * the Morton key, range-partition + sort by it, write `nFiles`
    * parquet files.
    *
    * Scale design: the quantization bounds come from ONE tiny agg (4
    * numbers to the driver); the rewrite is a single range-shuffle on
    * the z-key (the same price as any global sort). Each output file
    * then covers a compact z-range — a small min/max box in BOTH
    * dimensions — so a reader with a 2-dim box predicate skips most
    * files on parquet footer stats alone. That's the point: compaction
    * fixes file COUNT, z-ordering fixes file PRUNABILITY. */
  def zorderWrite(df: org.apache.spark.sql.DataFrame, dir: String,
      dimA: String, dimB: String, nFiles: Int, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions._
    val b = df.agg(
      min(col(dimA)).cast("double"), max(col(dimA)).cast("double"),
      min(col(dimB)).cast("double"), max(col(dimB)).cast("double")).head()
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty input OR an all-NULL dimension: no usable bounds — write
      // the data unchanged rather than NPE on a null min/max
      df.write.mode("overwrite").parquet(dir)
      return
    }
    val (loA, hiA, loB, hiB) = (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val top = (1L << bits) - 1
    def q(c: String, lo: Double, hi: Double) =
      if (hi <= lo) "0L"
      else s"cast(least(floor((cast(`$c` as double) - $lo) * $top / ($hi - $lo)), $top) as bigint)"
    val zed = df.withColumn("__za", expr(q(dimA, loA, hiA)))
      .withColumn("__zb", expr(q(dimB, loB, hiB)))
      .withColumn("__zkey", expr(zkeySql("__za", "__zb", bits)))
    zed.repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__za", "__zb", "__zkey")
      .write.mode("overwrite").parquet(dir)
  }

  /** Lays out lineitem+orders BUCKETED on the order key (8 buckets,
    * sorted, one file per bucket via a pre-repartition on the same
    * hash) as external bucketed tables, once per (session, sfDir) —
    * every later equi-join on the key then reads bucket i of both
    * sides into one task with NO Exchange on either side (and no
    * re-sort: single sorted file per bucket reports its ordering).
    * This is the storage-layer answer to the repeated fact-to-fact
    * join: pay one layout write, every downstream join skips its two
    * biggest shuffles. PlanSpec asserts the exchange-free plan;
    * bucket01 gates the join RESULT cross-engine. */
  def bucketedPair(spark: SparkSession, dir: String): (String, String) = {
    val tag = f"${math.abs(dir.hashCode)}%x"
    val li = s"graft_li_bucketed_$tag"
    val o = s"graft_o_bucketed_$tag"
    def ensure(name: String, src: String, key: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        import org.apache.spark.sql.functions.col
        val path = java.nio.file.Files
          .createTempDirectory(s"graft_bucketed_$name").resolve("t").toString
        spark.read.parquet(src)
          .repartition(8, col(key)) // same Murmur3 hash as bucketBy -> 1 file/bucket
          .write.mode("overwrite")
          .bucketBy(8, key).sortBy(key)
          .option("path", path)
          .saveAsTable(name)
      }
    ensure(li, s"$dir/lineitem.parquet", "l_orderkey")
    ensure(o, s"$dir/orders.parquet", "o_orderkey")
    (li, o)
  }
}
