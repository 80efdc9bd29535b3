package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  test("compaction merges a splintered directory and preserves every row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("layout").resolve("tbl").toString
    (1 to 10000).toDF("v").withColumn("g", col("v") % 7)
      .repartition(40).write.parquet(dir)
    val before = Layout.plan(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(before.nFiles == 40 && before.targetFiles == 1 && before.needed)

    val acted = Layout.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(acted.needed)
    val after = Layout.plan(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(after.nFiles == 1, s"expected 1 file, got ${after.nFiles}")
    // no .compact-* residue
    assert(!new java.io.File(dir + ".compact-tmp").exists())
    assert(!new java.io.File(dir + ".compact-old").exists())
    // content identical
    val got = spark.read.parquet(dir).as[(Int, Int)].collect().sorted
    assert(got.length == 10000 && got.map(_._1).toSeq == (1 to 10000))
  }

  test("compaction is a no-op on an already-healthy layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("layout2").resolve("tbl").toString
    (1 to 100).toDF("v").coalesce(1).write.parquet(dir)
    val p = Layout.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(!p.needed && p.nFiles == 1)
  }

  test("plan on a missing directory reports empty, never throws") {
    val p = Layout.plan(spark, "/tmp/layout-does-not-exist-xyz")
    assert(p.nFiles == 0 && p.totalBytes == 0 && p.targetFiles == 1 && !p.needed)
  }
}
