package graft.ops

import org.apache.spark.sql.SparkSession

/** Job labeling (optimization guide §1.5): every multi-job lifecycle op
  * sets a description so the Spark UI / job listeners attribute its jobs
  * to the op, not to an anonymous `count at ...` callsite. Thread-local
  * and restored on exit, so nested ops show the innermost label and
  * concurrent driver threads don't clobber each other. */
object Jobs {
  def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
