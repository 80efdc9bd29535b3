package graft.catalog

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.SparkSpec
import graft.ops.{ColumnMapping, TxLog}

/** MODEL-BASED check of the column-mapping protocol: a deterministic
  * random sequence of schema evolution (rename/drop/add) interleaved
  * with writes (append), row-level deletes (copy-on-write AND
  * merge-on-read), and compaction runs against BOTH the TxLog table and
  * a trivial in-memory model; after every few operations the full read
  * must equal the model, refusals must fire exactly when the model says
  * (drop of a live-DV-keyed column), and at the end a sample of
  * RECORDED versions must time-travel back to the model's state as of
  * that version — schema names of the era included. This is the spec
  * that makes "renames never corrupt data, drops never resurrect, DVs
  * never miss" a property, not nine examples. */
class ColumnMappingModelSpec extends SparkSpec {

  // ---- the model: rows keyed by id; each row maps CURRENT logical
  // column name -> Option[value]; the id column may itself be renamed
  private case class ModelState(schema: Vector[String], key: String,
    rows: Map[Long, Map[String, Option[String]]])

  Seq(20260816L, 4242424242L).foreach { seed =>
  test(s"random evolution/write/delete/compact sequences match the model (seed $seed)") {
    val rnd = new Random(seed)
    val base = Files.createTempDirectory("graft_cmodel")
    val table = base.resolve("t")

    var schema = Vector("doc_id", "a", "b") // logical names, doc_id = key
    var keyCol = "doc_id"
    val rows = mutable.LinkedHashMap.empty[Long, mutable.Map[String, Option[String]]]
    // ground truth for the drop-refusal expectation: the PHYSICAL key
    // columns live DVs currently record (read from the sidecars — a COW
    // delete can rewrite away some DV-carrying files as a side effect,
    // so approximate bookkeeping would drift)
    def dvPhysCols: Set[String] = TxLog.snapshotAt(table).files
      .flatMap(f => TxLog.dvKeysFor(table, f).map(_._1)).toSet
    var nextId = 0L
    var colEpoch = 0
    val history = mutable.ArrayBuffer.empty[(Long, ModelState)] // version -> state

    def sparkSchema: StructType = StructType(schema.map(c =>
      if (c == keyCol) StructField(c, LongType, nullable = true)
      else StructField(c, StringType, nullable = true)))

    def toDf(ids: Seq[Long]) = {
      val data = ids.map { id =>
        Row.fromSeq(schema.map(c =>
          if (c == keyCol) id else rows(id)(c).orNull))
      }
      spark.createDataFrame(java.util.Arrays.asList(data: _*), sparkSchema)
    }

    def record(version: Long): Unit =
      history += ((version, ModelState(schema, keyCol,
        rows.map { case (k, v) => k -> v.toMap }.toMap)))

    def checkAgainst(df: org.apache.spark.sql.DataFrame, m: ModelState,
        what: String): Unit = {
      assert(df.schema.fieldNames.toVector == m.schema, s"$what: schema drift")
      val got = df.collect().map { r =>
        val id = r.getLong(r.fieldIndex(m.key))
        id -> m.schema.filter(_ != m.key).map(c =>
          c -> Option(r.get(r.fieldIndex(c))).map(_.toString)).toMap
      }.toMap
      val want = m.rows.map { case (id, vs) =>
        id -> m.schema.filter(_ != m.key).map(c => c -> vs(c)).toMap
      }
      assert(got.size == m.rows.size, s"$what: row count ${got.size} != ${want.size}")
      assert(got == want, s"$what: row content drift")
    }

    // seed: v0
    (0 until 8).foreach { _ =>
      rows(nextId) = mutable.Map(schema.filter(_ != keyCol)
        .map(c => c -> (Some(s"$c=$nextId"): Option[String])): _*)
      nextId += 1
    }
    record(TxLog.append(spark, toDf(rows.keys.toSeq.takeRight(8)), table, keyCol, nParts = 2))

    (1 to 40).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // append 3-6 fresh rows
          val ids = (0 until 3 + rnd.nextInt(4)).map { _ =>
            rows(nextId) = mutable.Map(schema.filter(_ != keyCol)
              .map(c => c -> (Some(s"$c=$nextId"): Option[String])): _*)
            nextId += 1; nextId - 1
          }
          record(TxLog.append(spark, toDf(ids), table, keyCol, nParts = 1))
        case 1 => // rename a random column (key included)
          val from = schema(rnd.nextInt(schema.size))
          val to = s"${from.takeWhile(_ != '_')}_r$colEpoch"
          colEpoch += 1
          val v = TxLog.renameColumn(spark, table, from, to)
          schema = schema.map(c => if (c == from) to else c)
          if (keyCol == from) keyCol = to
          rows.values.foreach { r =>
            if (r.contains(from)) { r(to) = r(from); r.remove(from): Unit }
          }
          record(v)
        case 2 => // drop a random non-key column — refused iff live DVs key on it
          val candidates = schema.filter(_ != keyCol)
          if (candidates.nonEmpty) {
            val c = candidates(rnd.nextInt(candidates.size))
            val phys = ColumnMapping.physicalOf(TxLog.tableSchema(table).get, c)
            if (dvPhysCols.contains(phys)) {
              intercept[IllegalArgumentException] { TxLog.dropColumn(spark, table, c) }
            } else {
              val v = TxLog.dropColumn(spark, table, c)
              schema = schema.filterNot(_ == c)
              rows.values.foreach(_.remove(c): Unit)
              record(v)
            }
          }
        case 3 => // add a column (sometimes re-adding a previously dropped name)
          val name = if (rnd.nextBoolean() && !schema.contains("a")) "a"
            else s"c$colEpoch"
          colEpoch += 1
          if (!schema.contains(name)) {
            val v = TxLog.addColumn(table, name, StringType)
            schema = schema :+ name
            rows.values.foreach(r => r(name) = None)
            record(v)
          }
        case 4 => // copy-on-write delete of up to 3 live keys
          val live = rows.keys.toVector
          if (live.nonEmpty) {
            val victims = rnd.shuffle(live).take(1 + rnd.nextInt(3))
            import spark.implicits._
            val (v, _, _) = TxLog.deleteKeys(spark, table,
              victims.toDF(keyCol), keyCol, keyCol)
            victims.foreach(rows.remove(_): Unit)
            record(v)
          }
        case 5 => // merge-on-read delete of up to 2 live keys -> DVs key on keyCol
          val live = rows.keys.toVector
          if (live.nonEmpty) {
            import spark.implicits._
            val victims = rnd.shuffle(live).take(1 + rnd.nextInt(2))
            val (v, _, _, _) = TxLog.deleteMor(spark, table,
              victims.toDF(keyCol), keyCol)
            victims.foreach(rows.remove(_): Unit)
            record(v)
          }
        case 6 => // compact folds DVs and clears the drop refusal
          record(TxLog.compact(spark, table, keyCol, nParts = 2))
      }
      if (step % 5 == 0) {
        checkAgainst(TxLog.readAt(spark, table),
          ModelState(schema, keyCol, rows.map { case (k, v) => k -> v.toMap }.toMap),
          s"step $step (current)")
      }
    }

    // final current-state check
    checkAgainst(TxLog.readAt(spark, table),
      ModelState(schema, keyCol, rows.map { case (k, v) => k -> v.toMap }.toMap),
      "final (current)")
    // time travel: every 3rd recorded version must replay its era's
    // schema AND content exactly
    history.zipWithIndex.filter(_._2 % 3 == 0).foreach { case ((v, m), _) =>
      checkAgainst(TxLog.readAt(spark, table, Some(v)), m, s"time travel v$v")
    }
    // the physical column names on disk never left the frozen/fresh set:
    // every live file's footer must be readable under the CURRENT
    // physical schema (no logical name ever leaked into a file)
    val phys = ColumnMapping.physicalSchema(TxLog.tableSchema(table).get).fieldNames.toSet
    TxLog.snapshotAt(table).files.foreach { f =>
      val names = spark.read.parquet(table.resolve(f.path).toString)
        .schema.fieldNames.toSet
      // every on-disk name is a frozen original, a fresh col_<uuid>, or
      // a current physical — never a post-rename LOGICAL name
      assert(names.forall(n =>
          phys(n) || Set("doc_id", "a", "b")(n) || n.startsWith("col_")),
        s"a logical name leaked into ${f.path}: $names")
    }
  }
  }
}
