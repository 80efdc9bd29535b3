package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.SimilarityQueries

/** Dev A/B for knn06's BUILD-vs-SERVE split: the gated query carries
  * its own index build (codebook training, assignments, four lake
  * commits) for self-containment, so its scale curve measures
  * build+serve. A production index amortizes the build across every
  * query batch — what must stay flat as the corpus grows is SERVING
  * (probe 2 coarse lists of ~constant size, ADC over the candidates'
  * m-byte codes, shortlist-bounded rerank). This tool builds the four
  * persisted artifacts ONCE per corpus and times the serving plan
  * alone over decorrelated repetitions (min wins).
  *
  * Usage: runMain graft.tools.ServeAb [sfDir] [reps]
  *   sfDir: a testdata dir or a ScaleBench expansion (x1/x3/x10)
  */
object ServeAb {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (centT, assignT, cbT, codeT) = SimilarityQueries.buildLakeIvfPq(spark, dir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t1 = System.nanoTime()
      val n = SimilarityQueries.serveLakeIvfAdc(spark, dir,
        centT, assignT, cbT, codeT).count()
      best = math.min(best, (System.nanoTime() - t1) / 1e9)
      require(n == 40, s"expected 4 queries x top-10, got $n")
    }
    println(f"SERVEAB dir=$dir build=${buildSec}%.2f s serve_min=${best}%.2f s")
    spark.stop()
  }
}
