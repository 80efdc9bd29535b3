package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (getOrCreate -> one JVM-wide session,
  * suites run against the same warm context). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(cores = 8, shufflePartitions = 8)
  def sf0001 = "/root/testdata/sf0.001"
}
