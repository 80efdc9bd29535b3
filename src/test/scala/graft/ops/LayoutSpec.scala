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

  test("z-order write makes per-file min/max boxes prunable in BOTH dimensions") {
    val orders = graft.queries.Tables.t(spark, sf0001, "orders")
    val base = Files.createTempDirectory("layout_z")
    val zDir = base.resolve("zorder").toString
    val hDir = base.resolve("hashed").toString
    Layout.zorderWrite(orders, zDir, "o_custkey", "o_totalprice", nFiles = 8)
    orders.repartition(8).write.parquet(hDir) // the layout a naive write leaves

    // per-file [min,max] boxes straight from the files (what footer
    // stats give a reader); count files a 2-dim box predicate touches
    def boxes(dir: String): Seq[(Long, Long, Double, Double)] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-")).toSeq.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("o_custkey"), max("o_custkey"), min("o_totalprice"), max("o_totalprice")).head()
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      }
    val stats = orders.agg(
      min("o_custkey"), max("o_custkey"), min("o_totalprice"), max("o_totalprice")).head()
    val (loK, hiK) = (stats.getLong(0), stats.getLong(1))
    val (loP, hiP) = (stats.getDouble(2), stats.getDouble(3))
    // query box: bottom quarter of custkey x bottom quarter of price
    val (qk, qp) = (loK + (hiK - loK) / 4, loP + (hiP - loP) / 4)
    def touched(bs: Seq[(Long, Long, Double, Double)]): Int =
      bs.count { case (k0, _, p0, _) => k0 <= qk && p0 <= qp }
    val zTouched = touched(boxes(zDir))
    val hTouched = touched(boxes(hDir))
    assert(spark.read.parquet(zDir).count() == orders.count())
    assert(hTouched >= 7, s"hash layout should be unprunable, touched $hTouched/8")
    assert(zTouched <= 4, s"z-order layout should skip most files, touched $zTouched/8")
  }

  test("hive-partitioned write prunes partitions at plan time") {
    import org.apache.spark.sql.execution.ExplainMode
    val dir = Files.createTempDirectory("layout_part").resolve("events_by_day").toString
    val ev = graft.queries.Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    ev.write.partitionBy("day").parquet(dir)
    val nDays = ev.select("day").distinct().count()
    assert(nDays > 10, s"fixture needs many partitions, got $nDays")

    val q = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("2024-01-05"), s"day predicate must prune partitions: $pf")
    // the scan must EXECUTE against one partition directory, not all of
    // them (inputFiles reflects the pre-pruning relation, so read the
    // executed scan's numFiles metric instead)
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(q.collect().length.toLong == expected)
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    val numFiles = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(dir).inputFiles.length
    assert(numFiles < totalFiles / 5,
      s"scan read $numFiles files of $totalFiles — partitions not pruned")
  }

  test("zkeySql interleaves bits identically to a reference Morton encode") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(j => (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))).sum
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (12345L, 54321L))
      .toDF("a", "b")
      .withColumn("z", expr(Layout.zkeySql("a", "b")))
    df.collect().foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }
}
