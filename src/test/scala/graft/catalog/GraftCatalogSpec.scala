package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TxLog

/** SQL-surface contracts of the TxLog catalog: latest-snapshot reads,
  * VERSION AS OF time travel, listTables, the deletion-vector refusal,
  * and the read-only mount behavior. LakeQueries/sql01 gates the data
  * semantics against DuckDB; this covers the catalog plumbing. */
class GraftCatalogSpec extends SparkSpec {

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("payload", concat(lit("v"), col("doc_id")))
  }

  private def freshCatalog(): (String, java.nio.file.Path) = {
    val base = Files.createTempDirectory("graft_cat")
    val name = s"lake${math.abs(base.hashCode()).toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base.toString)
    (name, base)
  }

  test("catalog: SQL reads the latest snapshot; VERSION AS OF time-travels") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("docs")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 2)  // v0
    TxLog.append(spark, idsDf(10L to 19L), table, "doc_id", nParts = 2) // v1
    TxLog.deleteKeys(spark, table,
      idsDf(Seq(5L, 15L)).select("doc_id"), "doc_id", "doc_id")         // v2 (COW)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.docs").head.getLong(0) == 18L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.docs VERSION AS OF 1")
      .head.getLong(0) == 20L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.docs VERSION AS OF 0")
      .head.getLong(0) == 10L)
    // predicates and projection flow into the plain parquet scan
    val rows = spark.sql(
      s"SELECT payload FROM $cat.docs WHERE doc_id BETWEEN 14 AND 16 ORDER BY payload")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("v14", "v16"))
  }

  test("catalog: lists log-backed tables, refuses DV snapshots and writes") {
    val (cat, base) = freshCatalog()
    TxLog.append(spark, idsDf(0L to 4L), table = base.resolve("t1"), "doc_id", nParts = 1)
    TxLog.append(spark, idsDf(0L to 4L), table = base.resolve("t2"), "doc_id", nParts = 1)
    Files.createDirectories(base.resolve("not_a_table"))
    val listed = spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1)).toSet
    assert(listed == Set("t1", "t2"))
    // a merge-on-read snapshot is refused with a pointer to the fix
    TxLog.deleteMor(spark, base.resolve("t1"), idsDf(Seq(2L)).select("doc_id"), "doc_id")
    val e = intercept[Exception] { spark.sql(s"SELECT * FROM $cat.t1").collect() }
    assert(e.getMessage.contains("deletion vectors"))
    // compaction folds the vectors; the catalog serves the table again
    TxLog.compact(spark, base.resolve("t1"), "doc_id", nParts = 1)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.t1").head.getLong(0) == 4L)
    // read-only mount
    val w = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t3 (x BIGINT) USING parquet")
    }
    assert(w.getMessage.contains("read-only") || w.getMessage.contains("TxLog"))
  }
}
