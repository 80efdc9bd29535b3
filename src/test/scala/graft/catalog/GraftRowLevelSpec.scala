package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TxLog

/** Contracts of the native SQL row-level DML path (DSv2
  * SupportsRowLevelOperations, group-based copy-on-write): UPDATE and
  * MERGE INTO as first-class statements, group pruning (only affected
  * files rewrite), DV safety, CDC sidecars, and the preserved
  * metadata-only DELETE fast path. */
class GraftRowLevelSpec extends SparkSpec {

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("payload", concat(lit("v"), col("doc_id")))
  }

  private def freshCatalog(): (String, java.nio.file.Path) = {
    val base = Files.createTempDirectory("graft_rl")
    val name = s"rl${math.abs(base.hashCode()).toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base.toString)
    (name, base)
  }

  test("UPDATE ... WHERE is a native statement: group-pruned COW commit") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("u")
    // 4 files of 25 rows each, doc_id ranges disjoint per file
    (0 until 4).foreach { i =>
      TxLog.append(spark, idsDf((i * 25L) until (i * 25L + 25L)), table, "doc_id", nParts = 1)
    }
    val filesBefore = TxLog.snapshotAt(table).files.size
    assert(filesBefore == 4)
    spark.sql(s"UPDATE $cat.u SET payload = concat(payload, '!') WHERE doc_id BETWEEN 30 AND 40")
    // changed rows updated, everything else intact
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.u WHERE payload LIKE '%!'")
      .head.getLong(0) == 11L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.u").head.getLong(0) == 100L)
    assert(spark.sql(s"SELECT payload FROM $cat.u WHERE doc_id = 35").head.getString(0) == "v35!")
    assert(spark.sql(s"SELECT payload FROM $cat.u WHERE doc_id = 5").head.getString(0) == "v5")
    // ONE commit, op 'update', and ONLY the file covering [25,50) rewrote
    val (v, op, _, nRemoves) = TxLog.history(table).last
    assert(op == "update", op)
    assert(nRemoves == 1L, s"expected 1 group replaced, got $nRemoves")
    // CDC sidecar recorded: the change feed can replay SQL DML
    assert(TxLog.commitCdcFile(table, v).isDefined)
    val cdc = spark.read.parquet(
      table.resolve(TxLog.commitCdcFile(table, v).get).toString)
    assert(cdc.filter(col("_change_type") === "delete").count() == 11L)
    assert(cdc.filter(col("_change_type") === "insert").count() == 11L)
  }

  test("UPDATE without WHERE rewrites every live file") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("ua")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 2)
    spark.sql(s"UPDATE $cat.ua SET payload = upper(payload)")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.ua WHERE payload LIKE 'V%'")
      .head.getLong(0) == 10L)
    val (_, op, _, nRemoves) = TxLog.history(table).last
    assert(op == "update" && nRemoves == 2L)
  }

  test("MERGE INTO updates matched rows and inserts unmatched ones") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("m")
    (0 until 4).foreach { i =>
      TxLog.append(spark, idsDf((i * 25L) until (i * 25L + 25L)), table, "doc_id", nParts = 1)
    }
    idsDf(Seq(7L, 42L, 200L)).withColumn("payload", concat(lit("new"), col("doc_id")))
      .createOrReplaceTempView("rl_merge_src")
    spark.sql(
      s"""MERGE INTO $cat.m t USING rl_merge_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET t.payload = s.payload
         |WHEN NOT MATCHED THEN INSERT (doc_id, payload) VALUES (s.doc_id, s.payload)
         |""".stripMargin)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.m").head.getLong(0) == 101L)
    assert(spark.sql(s"SELECT payload FROM $cat.m WHERE doc_id = 7").head.getString(0) == "new7")
    assert(spark.sql(s"SELECT payload FROM $cat.m WHERE doc_id = 42").head.getString(0) == "new42")
    assert(spark.sql(s"SELECT payload FROM $cat.m WHERE doc_id = 200").head.getString(0) == "new200")
    assert(spark.sql(s"SELECT payload FROM $cat.m WHERE doc_id = 8").head.getString(0) == "v8")
    val (v, op, _, nRemoves) = TxLog.history(table).last
    assert(op == "merge", op)
    // runtime group filtering: only the two files containing 7 and 42
    // are replaced — files [50,75) and [75,100) are untouched
    assert(nRemoves == 2L, s"expected 2 groups replaced, got $nRemoves")
    assert(TxLog.commitCdcFile(table, v).isDefined)
  }

  test("row-level UPDATE applies deletion vectors instead of resurrecting rows") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("dv")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 1)
    TxLog.deleteMor(spark, table, idsDf(Seq(3L)).select("doc_id"), "doc_id")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.dv").head.getLong(0) == 9L)
    spark.sql(s"UPDATE $cat.dv SET payload = 'x' WHERE doc_id >= 0")
    // the DV'd row must NOT come back; everything live is updated
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.dv").head.getLong(0) == 9L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.dv WHERE payload = 'x'")
      .head.getLong(0) == 9L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.dv WHERE doc_id = 3")
      .head.getLong(0) == 0L)
    // the rewrite folded the vector in: no DV sidecars remain live
    assert(TxLog.snapshotAt(table).files.forall(_.dv.isEmpty))
  }

  test("translatable DELETE keeps the metadata-only path; others go row-level") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("d")
    (0 until 2).foreach { i =>
      TxLog.append(spark, idsDf((i * 50L) until (i * 50L + 50L)), table, "doc_id", nParts = 1)
    }
    // fully-pushable predicate: OptimizeMetadataOnlyDeleteFromTable must
    // convert the rewritten plan back to the deleteWhere fast path —
    // visible as a plan WITHOUT ReplaceData
    val plan = spark.sql(s"EXPLAIN DELETE FROM $cat.d WHERE doc_id < 10")
      .head.getString(0)
    assert(!plan.contains("ReplaceData"), plan)
    spark.sql(s"DELETE FROM $cat.d WHERE doc_id < 10")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.d").head.getLong(0) == 90L)
    assert(TxLog.history(table).last._2 == "delete")
    // non-translatable predicate (modulo): previously unsupported, now a
    // group-based COW delete
    spark.sql(s"DELETE FROM $cat.d WHERE doc_id % 2 = 1")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.d").head.getLong(0) == 45L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.d WHERE doc_id % 2 = 1")
      .head.getLong(0) == 0L)
    assert(TxLog.history(table).last._2 == "delete")
  }

  test("_graft_file is a user-queryable metadata column (plain and DV tables)") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("mf")
    (0 until 3).foreach { i =>
      TxLog.append(spark, idsDf((i * 10L) until (i * 10L + 10L)), table, "doc_id", nParts = 1)
    }
    // the skew/debug query every lake ships: rows per serving file
    val perFile = spark.sql(
      s"SELECT _graft_file, COUNT(*) AS n FROM $cat.mf GROUP BY _graft_file")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(perFile.length == 3 && perFile.forall(_._2 == 10L), perFile.toSeq.toString)
    assert(perFile.map(_._1).toSet ==
      TxLog.snapshotAt(table).files.map(_.path).toSet)
    // ...and it composes with predicates (group scan is stat-pruned)
    assert(spark.sql(
      s"SELECT DISTINCT _graft_file FROM $cat.mf WHERE doc_id BETWEEN 12 AND 18")
      .count() == 1L)
    // DV tables serve it too, with deleted rows already dropped
    TxLog.deleteMor(spark, table, idsDf(Seq(5L)).select("doc_id"), "doc_id")
    val n = spark.sql(s"SELECT _graft_file FROM $cat.mf").count()
    assert(n == 29L, s"expected 29 live rows, got $n")
    // ...and a time-travel read serves ITS OWN era's files: after a
    // compact, VERSION AS OF 2 (the 3-file pre-DV era) must still
    // report the original 3 files, not the compacted latest
    TxLog.compact(spark, table, "doc_id", nParts = 1)
    val v2Files = spark.sql(
      s"SELECT DISTINCT _graft_file FROM $cat.mf VERSION AS OF 2").count()
    assert(v2Files == 3L, s"time-travel file tag served $v2Files files")
    assert(spark.sql(s"SELECT DISTINCT _graft_file FROM $cat.mf").count() == 1L)
  }

  test("MERGE with conditional clauses and NOT MATCHED BY SOURCE") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("mb")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 1)
    idsDf(Seq(2L, 5L, 20L)).createOrReplaceTempView("rl_mbs_src")
    // matched-with-condition update, conditional insert, and the
    // full-sync clause: target rows absent from the source DELETE
    spark.sql(
      s"""MERGE INTO $cat.mb t USING rl_mbs_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED AND t.doc_id = 5 THEN UPDATE SET t.payload = 'five'
         |WHEN NOT MATCHED AND s.doc_id < 100 THEN INSERT (doc_id, payload) VALUES (s.doc_id, 'new')
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    val rows = spark.sql(s"SELECT doc_id, payload FROM $cat.mb ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // kept: matched 2 (payload untouched) and 5 (updated); inserted 20;
    // every other target row deleted by the BY SOURCE clause
    assert(rows == Seq((2L, "v2"), (5L, "five"), (20L, "new")), rows.toString)
    assert(TxLog.history(table).last._2 == "merge")
  }

  test("UPDATE with an IN-subquery predicate routes through the rewrite") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("sq")
    TxLog.append(spark, idsDf(0L to 19L), table, "doc_id", nParts = 2)
    idsDf(Seq(3L, 7L, 11L)).createOrReplaceTempView("rl_sq_keys")
    spark.sql(s"UPDATE $cat.sq SET payload = 'picked' " +
      "WHERE doc_id IN (SELECT doc_id FROM rl_sq_keys)")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.sq WHERE payload = 'picked'")
      .head.getLong(0) == 3L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.sq").head.getLong(0) == 20L)
  }

  test("DML against a time-travel relation is rejected at analysis") {
    val (cat, base) = freshCatalog()
    TxLog.append(spark, idsDf(0L to 4L), base.resolve("tt"), "doc_id", nParts = 1)
    TxLog.append(spark, idsDf(5L to 9L), base.resolve("tt"), "doc_id", nParts = 1)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.tt VERSION AS OF 0 SET payload = 'x'")
    }
    assert(e.getMessage != null)
    // the real table is untouched and still serves both versions
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.tt").head.getLong(0) == 10L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.tt WHERE payload LIKE 'v%'")
      .head.getLong(0) == 10L)
  }

  test("UPDATE on a partitioned table stays correct under partition-pruned reads") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.pt (doc_id BIGINT, tag STRING) PARTITIONED BY (tag)")
    spark.sql(s"INSERT INTO $cat.pt SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END " +
      "FROM range(100)")
    spark.sql(s"UPDATE $cat.pt SET doc_id = doc_id + 1000 WHERE doc_id < 10")
    // data files always CARRY the partition column (stagePartitioned
    // duplicates it), and a rewritten file with no recorded
    // partitionValues is kept CONSERVATIVELY by partition pruning — so
    // equality reads stay exact after the rewrite, they just prune less
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.pt").head.getLong(0) == 100L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.pt WHERE tag = 'a'")
      .head.getLong(0) == 50L)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM $cat.pt WHERE tag = 'a' AND doc_id >= 1000")
      .head.getLong(0) == 5L)
    val table = base.resolve("pt")
    assert(TxLog.readAt(spark, table, partitions = Map("tag" -> "b")).count() == 50L)
    assert(TxLog.readAt(spark, table, partitions = Map("tag" -> "b"))
      .filter(col("doc_id") >= 1000).count() == 5L)
  }

  test("SQL UPDATE/MERGE produce the same table as the procedure path") {
    val (cat, base) = freshCatalog()
    TxLog.append(spark, idsDf(0L to 59L), base.resolve("a"), "doc_id", nParts = 3)
    TxLog.append(spark, idsDf(0L to 59L), base.resolve("b"), "doc_id", nParts = 3)
    // statement path on a
    spark.sql(s"UPDATE $cat.a SET payload = concat(payload, '+') WHERE doc_id >= 40")
    // procedure path on b (same semantics through mergeCow)
    spark.sql(
      s"CALL $cat.update_where('b', 'doc_id', 'doc_id >= 40', 'payload', " +
      "\"concat(payload, '+')\")").collect()
    val a = spark.sql(s"SELECT * FROM $cat.a ORDER BY doc_id").collect().toSeq
    val b = spark.sql(s"SELECT * FROM $cat.b ORDER BY doc_id").collect().toSeq
    assert(a == b)
    // MERGE vs merge_into procedure
    idsDf(Seq(5L, 100L)).withColumn("payload", lit("zz"))
      .createOrReplaceTempView("rl_eq_src")
    spark.sql(
      s"""MERGE INTO $cat.a t USING rl_eq_src s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    spark.sql(s"CALL $cat.merge_into('b', 'rl_eq_src', 'doc_id')").collect()
    val a2 = spark.sql(s"SELECT * FROM $cat.a ORDER BY doc_id").collect().toSeq
    val b2 = spark.sql(s"SELECT * FROM $cat.b ORDER BY doc_id").collect().toSeq
    assert(a2 == b2)
  }
}
