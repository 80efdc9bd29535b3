package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{TextIndex, TxLog}

/** Dev A/B for the text index's BUILD-vs-SERVE split (the ServeAb
  * pattern applied to tix01): the gated queries carry their own index
  * build (corpus tokenize + clustered postings write) for
  * self-containment, so their scale curves measure build+serve. A
  * production index amortizes the build across every query; what must
  * stay ~flat as the corpus grows is SERVING — per query term one
  * footer-pruned posting-list read + a 1-row stats broadcast. This
  * tool builds the index ONCE per corpus and times searchBm25 alone
  * over decorrelated repetitions (min wins).
  *
  * Usage: runMain graft.tools.TextServeAb [sfDir] [reps]
  *   sfDir: a testdata dir or a ScaleBench expansion (x1/x3/x10)
  */
object TextServeAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("graft_textserve")
    val corpus = work.resolve("corpus")
    val index = work.resolve("ix")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("bigint").as("doc_id"), col("text"))
    val t0 = System.nanoTime()
    TxLog.append(spark, docs, corpus, "doc_id", nParts = 8)
    val nDocs = TextIndex.ensureIndexed(spark, corpus, index)
    val buildSec = (System.nanoTime() - t0) / 1e9
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t1 = System.nanoTime()
      val n = TextIndex.searchBm25(spark, index,
        Seq("spark", "join", "filter"), 20).count()
      best = math.min(best, (System.nanoTime() - t1) / 1e9)
      require(n == 20, s"expected top-20, got $n")
    }
    println(f"TEXTSERVEAB dir=$dir docs=$nDocs build=${buildSec}%.2f s " +
      f"serve_min=${best}%.2f s")
    TxLog.deleteTree(work)
    spark.stop()
  }
}
