package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.{ColumnMapping, TxLog}

/** `ALTER TABLE RENAME/DROP COLUMN` under column mapping (the Delta
  * name-mode design re-expressed over the TxLog): renames and drops are
  * ONE metadata commit — no data file, DV sidecar, stats entry, or CDC
  * sidecar is rewritten — and every read/write path (snapshot reads,
  * time travel, merge-on-read DVs, COW DML, compaction, the change
  * feed, SQL row-level DML) stays consistent across the rename
  * boundary. sql20/sql21 gate the data semantics against DuckDB; this
  * covers the protocol mechanics and refusal contracts. */
class ColumnMappingSpec extends SparkSpec {

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("payload", concat(lit("v"), col("doc_id")))
  }

  private def freshCatalog(): (String, java.nio.file.Path) = {
    val base = Files.createTempDirectory("graft_cmap")
    val name = s"cm${math.abs(base.hashCode()).toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base.toString)
    (name, base)
  }

  test("rename: one metadata commit; old+new era files read uniformly; writes land physical") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("docs")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 2)   // v0 (pre-rename files)
    val preFiles = TxLog.snapshotAt(table).files.map(_.path).toSet
    TxLog.renameColumn(spark, table, "doc_id", "document_id")           // v1: metadata only
    assert(TxLog.snapshotAt(table).files.map(_.path).toSet == preFiles,
      "rename must not touch data files")

    // logical schema renamed; physical name frozen at the old name
    val s = TxLog.tableSchema(table).get
    assert(s.fieldNames.toSeq == Seq("document_id", "payload"))
    assert(ColumnMapping.physicalOf(s, "document_id") == "doc_id")

    // post-rename append: the NEW file must carry the physical name
    TxLog.append(spark, idsDf(10L to 14L).withColumnRenamed("doc_id", "document_id"),
      table, "document_id", nParts = 1)                                 // v2
    val newFile = (TxLog.snapshotAt(table).files.map(_.path).toSet -- preFiles).head
    val footer = spark.read.parquet(table.resolve(newFile).toString).schema
    assert(footer.fieldNames.toSeq == Seq("doc_id", "payload"),
      s"post-rename files must persist PHYSICAL names, got ${footer.fieldNames.toSeq}")

    // both eras read under the logical name, API and SQL
    val api = TxLog.readAt(spark, table)
    assert(api.schema.fieldNames.toSeq == Seq("document_id", "payload"))
    assert(api.count() == 15L)
    assert(spark.sql(s"SELECT sum(document_id) AS s FROM $cat.docs").head.getLong(0) ==
      (0L to 14L).sum)
    // range-pruned read on the RENAMED column still prunes via the
    // physical-keyed footer stats (and stays exact)
    val pruned = TxLog.readAt(spark, table, range = Some(("document_id", 12L, 13L)))
    assert(pruned.select(sum("document_id")).head.getLong(0) == 25L)
  }

  test("rename: time travel serves each version under ITS logical names") {
    val (_, base) = freshCatalog()
    val table = base.resolve("tt")
    TxLog.append(spark, idsDf(0L to 4L), table, "doc_id", nParts = 1)  // v0
    TxLog.renameColumn(spark, table, "payload", "body")                // v1
    assert(TxLog.readAt(spark, table, Some(0L)).schema.fieldNames.toSeq ==
      Seq("doc_id", "payload"), "pre-rename version keeps its era's names")
    assert(TxLog.readAt(spark, table, Some(1L)).schema.fieldNames.toSeq ==
      Seq("doc_id", "body"))
    assert(TxLog.readAt(spark, table, Some(1L))
      .filter(col("doc_id") === 3L).head.getString(1) == "v3")
  }

  test("drop + re-add: dropped values never resurrect; pre-drop versions still serve them") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("redo")
    TxLog.append(spark, idsDf(0L to 4L), table, "doc_id", nParts = 1)  // v0
    TxLog.dropColumn(spark, table, "payload")                          // v1
    assert(TxLog.readAt(spark, table).schema.fieldNames.toSeq == Seq("doc_id"))
    TxLog.addColumn(table, "payload", org.apache.spark.sql.types.StringType) // v2
    // the re-added column has a FRESH physical name -> old file values
    // must NOT bleed back in
    val s = TxLog.tableSchema(table).get
    assert(ColumnMapping.physicalOf(s, "payload") != "payload",
      "re-added column must get a fresh physical name")
    val back = spark.sql(s"SELECT payload FROM $cat.redo").collect()
    assert(back.forall(_.isNullAt(0)), "dropped values resurrected after re-add")
    // time travel to the pre-drop version still serves the original
    assert(TxLog.readAt(spark, table, Some(0L))
      .filter(col("doc_id") === 2L).select("payload").head.getString(0) == "v2")
  }

  test("merge-on-read DVs survive renames in both orders (delete->rename, rename->delete)") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("mor")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 1)        // v0
    TxLog.deleteMor(spark, table, idsDf(Seq(3L)).select("doc_id"), "doc_id") // v1: DV keyed pre-rename
    TxLog.renameColumn(spark, table, "doc_id", "document_id")                // v2
    // DV written BEFORE the rename still drops its row
    assert(!spark.sql(s"SELECT document_id FROM $cat.mor").collect()
      .map(_.getLong(0)).contains(3L))
    // DV written AFTER the rename records the PHYSICAL key column
    import spark.implicits._
    TxLog.deleteMor(spark, table,
      Seq(7L).toDF("document_id"), "document_id")                            // v3
    val kept = spark.sql(s"SELECT document_id FROM $cat.mor ORDER BY document_id")
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
    // compact folds the DVs under the mapping; result unchanged
    TxLog.compact(spark, table, "document_id")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.mor").head.getLong(0) == 8L)
    assert(TxLog.snapshotAt(table).files.forall(_.dv.isEmpty))
  }

  test("SQL row-level DML (UPDATE/DELETE/MERGE) works across the rename boundary") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("dml")
    TxLog.append(spark, idsDf(0L to 9L), table, "doc_id", nParts = 2)
    TxLog.renameColumn(spark, table, "payload", "body")
    spark.sql(s"UPDATE $cat.dml SET body = 'edited' WHERE doc_id = 4")
    spark.sql(s"DELETE FROM $cat.dml WHERE doc_id >= 8")
    assert(spark.sql(s"SELECT body FROM $cat.dml WHERE doc_id = 4").head.getString(0)
      == "edited")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.dml").head.getLong(0) == 8L)
    // rewritten files still carry PHYSICAL names
    TxLog.snapshotAt(table).files.foreach { f =>
      val names = spark.read.parquet(table.resolve(f.path).toString).schema.fieldNames.toSeq
      assert(names == Seq("doc_id", "payload"), s"DML rewrite leaked logical names: $names")
    }
  }

  test("change feed: sidecars from before and after a rename serve CURRENT logical names") {
    val (_, base) = freshCatalog()
    val table = base.resolve("cdf")
    TxLog.append(spark, idsDf(0L to 5L), table, "doc_id", nParts = 1)           // v0
    TxLog.deleteKeys(spark, table, idsDf(Seq(1L)).select("doc_id"),
      "doc_id", "doc_id")                                                        // v1: COW + sidecar (pre-rename)
    TxLog.renameColumn(spark, table, "doc_id", "document_id")                    // v2
    import spark.implicits._
    TxLog.deleteKeys(spark, table, Seq(4L).toDF("document_id"),
      "document_id", "document_id")                                              // v3: sidecar (post-rename)
    val feed = TxLog.changeFeed(spark, table, 0L, 3L)
    assert(feed.schema.fieldNames.contains("document_id"),
      s"change feed must serve current logical names, got ${feed.schema.fieldNames.toSeq}")
    val dels = feed.filter(col("_change_type") === "delete")
      .select("document_id").collect().map(_.getLong(0)).toSet
    assert(dels == Set(1L, 4L))
  }

  test("refusals: partition cols, live DVs, constraints, reserved names, write-time evolution") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.p (doc_id BIGINT, region STRING) PARTITIONED BY (region)")
    val pTable = base.resolve("p")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, pTable, "region", "zone")
    }
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, pTable, "region")
    }

    val table = base.resolve("guard")
    TxLog.append(spark, idsDf(0L to 5L), table, "doc_id", nParts = 1)
    // reserved names
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, table, "payload", "_change_type")
    }
    // constraint still references the old name -> refuse
    TxLog.setConstraint(spark, table, "pos_id", "doc_id >= 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, table, "doc_id", "document_id")
    }
    assert(e.getMessage.contains("pos_id"))
    intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, table, "doc_id")
    }
    // drop with a live DV on the column -> refuse, compact -> allowed
    val t2 = base.resolve("dvguard")
    TxLog.append(spark, idsDf(0L to 5L), t2, "doc_id", nParts = 1)
    TxLog.deleteMor(spark, t2, idsDf(Seq(2L)).select("doc_id"), "doc_id")
    val e2 = intercept[IllegalArgumentException] {
      TxLog.dropColumn(spark, t2, "doc_id")
    }
    assert(e2.getMessage.contains("compact"))
    TxLog.compact(spark, t2, "doc_id")
    TxLog.dropColumn(spark, t2, "doc_id"): Unit
    // once mapping is active, WRITE-TIME evolution must route through
    // ALTER TABLE ADD COLUMN (fresh physical names are one-commit minted)
    val t3 = base.resolve("evo")
    TxLog.append(spark, idsDf(0L to 2L), t3, "doc_id", nParts = 1)
    TxLog.renameColumn(spark, t3, "payload", "body")
    intercept[IllegalArgumentException] {
      TxLog.append(spark,
        idsDf(Seq(3L)).withColumnRenamed("payload", "body").withColumn("extra", lit(1L)),
        t3, "doc_id", nParts = 1, allowEvolution = true)
    }
  }

  test("ALTER ADD after activation: fresh physical name; old files null-fill; inserts land") {
    val (cat, base) = freshCatalog()
    val table = base.resolve("evolve")
    TxLog.append(spark, idsDf(0L to 3L), table, "doc_id", nParts = 1)
    TxLog.renameColumn(spark, table, "doc_id", "document_id")
    spark.sql(s"ALTER TABLE $cat.evolve ADD COLUMN score BIGINT")
    val s = TxLog.tableSchema(table).get
    assert(ColumnMapping.physicalOf(s, "score").startsWith("col_"),
      "post-activation ADD COLUMN must mint a fresh physical name")
    spark.sql(s"INSERT INTO $cat.evolve VALUES (100, 'v100', 7)")
    val rows = spark.sql(
      s"SELECT document_id, score FROM $cat.evolve ORDER BY document_id").collect()
    assert(rows.length == 5)
    assert(rows.take(4).forall(_.isNullAt(1)), "pre-evolution rows must null-fill")
    assert(rows.last.getLong(1) == 7L)
  }

  test("clone and restore travel the mapping: clones stay independent, restore revives the era's schema") {
    val (_, base) = freshCatalog()
    val src = base.resolve("src")
    TxLog.append(spark, idsDf(0L to 4L), src, "doc_id", nParts = 1)    // v0
    TxLog.renameColumn(spark, src, "doc_id", "document_id")            // v1
    // clone carries the mapped schema; the hardlinked files stay readable
    val dst = base.resolve("dst")
    TxLog.cloneTable(spark, src, dst)
    assert(TxLog.readAt(spark, dst).schema.fieldNames.toSeq ==
      Seq("document_id", "payload"))
    assert(TxLog.readAt(spark, dst).count() == 5L)
    // evolution stays table-local after the clone
    TxLog.renameColumn(spark, dst, "document_id", "id2"): Unit
    assert(TxLog.readAt(spark, src).schema.fieldNames.head == "document_id")
    // restore to the pre-rename version revives ITS schema (the Delta
    // RESTORE rule: schema travels with the restored state)
    TxLog.append(spark, idsDf(5L to 7L).withColumnRenamed("doc_id", "document_id"),
      src, "document_id", nParts = 1)                                   // v2
    TxLog.restore(spark, src, 0L)                                       // v3
    val restored = TxLog.readAt(spark, src)
    assert(restored.schema.fieldNames.toSeq == Seq("doc_id", "payload"))
    assert(restored.count() == 5L)
  }

  test("streaming crosses the rename boundary on physical identity; ADD COLUMN still fails the stream") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, base) = freshCatalog()
    val table = base.resolve("stream")
    val ckpt = Files.createTempDirectory("graft_cmap_ckpt").toString
    TxLog.append(spark, idsDf(0L to 3L), table, "doc_id", nParts = 1)
    def drain(selectCol: String, ck: String = ckpt): Seq[Long] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-lake").load(table.toString)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select(selectCol).collect().foreach(r => got.add(r.getLong(0)))
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sorted
    }
    assert(drain("doc_id") == (0L to 3L))
    TxLog.renameColumn(spark, table, "doc_id", "document_id")
    TxLog.append(spark, idsDf(Seq(9L)).withColumnRenamed("doc_id", "document_id"),
      table, "document_id", nParts = 1)
    // a rename moves only the logical name — the same physical columns
    // stream on: the resumed checkpoint picks up exactly the new commit...
    assert(drain("document_id") == Seq(9L))
    // ...and a FRESH stream replays the pre-rename history under the
    // CURRENT names (the mapped read of the old files)
    assert(drain("document_id",
      Files.createTempDirectory("graft_cmap_ckpt2").toString) == Seq(0L, 1L, 2L, 3L, 9L))
    // a genuinely NEW physical column still fails a RUNNING stream (one
    // whose schema froze before the evolution — driven directly, since
    // an AvailableNow re-drain would re-freeze and mask the guard)
    val running = new graft.sources.LakeStreamSource(spark, table,
      skipChangeCommits = false, startingVersion = 0L)
    TxLog.addColumn(table, "score", org.apache.spark.sql.types.LongType)
    import spark.implicits._
    TxLog.append(spark,
      Seq((20L, "v20", 1L)).toDF("document_id", "payload", "score"),
      table, "document_id", nParts = 1)
    val last = TxLog.versions(table).last
    val e = intercept[IllegalStateException] {
      running.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(last)).collect()
    }
    assert(e.getMessage.contains("restart the stream"), e.getMessage)
    // ...while a rename alone would NOT have failed it: same physical set
  }

  test("the STREAMING change feed replays a rename-spanning history under current names") {
    import org.apache.spark.sql.streaming.Trigger
    val (_, base) = freshCatalog()
    val table = base.resolve("cdfstream")
    val ckpt = Files.createTempDirectory("graft_cmap_cdf_ckpt").toString
    TxLog.append(spark, idsDf(0L to 4L), table, "doc_id", nParts = 1)       // v0
    TxLog.deleteKeys(spark, table, idsDf(Seq(2L)).select("doc_id"),
      "doc_id", "doc_id")                                                    // v1: COW sidecar, pre-rename
    TxLog.renameColumn(spark, table, "doc_id", "document_id")                // v2
    import spark.implicits._
    TxLog.append(spark,
      idsDf(Seq(9L)).withColumnRenamed("doc_id", "document_id"),
      table, "document_id", nParts = 1)                                      // v3: post-rename insert
    TxLog.deleteMor(spark, table, Seq(4L).toDF("document_id"), "document_id") // v4: MOR, post-rename
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "true")
      .load(table.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("_change_type", "document_id").collect()
          .foreach(r => got.add((r.getString(0), r.getLong(1))))
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    val events = got.asScala.toSeq
    // pre-rename sidecars and files all serve the CURRENT logical name;
    // the replayed multiset is exactly the history's row-level changes
    assert(events.filter(_._1 == "insert").map(_._2).sorted ==
      Seq(0L, 1L, 2L, 3L, 4L, 9L))
    assert(events.filter(_._1 == "delete").map(_._2).sorted == Seq(2L, 4L))
  }

  test("SQL surface: ALTER TABLE RENAME/DROP COLUMN routes through the catalog") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.sqlddl (doc_id BIGINT, payload STRING, note STRING)")
    spark.sql(s"INSERT INTO $cat.sqlddl VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    spark.sql(s"ALTER TABLE $cat.sqlddl RENAME COLUMN payload TO body")
    spark.sql(s"ALTER TABLE $cat.sqlddl DROP COLUMN note")
    assert(spark.sql(s"SELECT * FROM $cat.sqlddl").schema.fieldNames.toSeq ==
      Seq("doc_id", "body"))
    spark.sql(s"INSERT INTO $cat.sqlddl VALUES (3, 'c')")
    assert(spark.sql(s"SELECT body FROM $cat.sqlddl WHERE doc_id = 3").head.getString(0)
      == "c")
    assert(TxLog.readAt(spark, base.resolve("sqlddl"), Some(0L))
      .schema.fieldNames.toSeq == Seq("doc_id", "payload", "note"))
  }
}
