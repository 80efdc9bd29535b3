package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Iceberg-style PARTITION EVOLUTION over the TxLog: `set-partitioning`
  * re-declares the layout of FUTURE writes as one metadata commit. Old
  * files keep their era's partition values (or none) and prune
  * conservatively; new files prune sharply; the resolution is versioned
  * and checkpoint-folded. sql22 gates the data semantics against
  * DuckDB; this covers the protocol mechanics and refusals. */
class PartitionEvolutionSpec extends SparkSpec {

  private def df(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
      .withColumn("payload", concat(lit("v"), col("doc_id")))
  }

  test("evolution: future writes lay out by the new columns; both eras read and prune exactly") {
    val base = Files.createTempDirectory("graft_pevo")
    val table = base.resolve("t")
    TxLog.append(spark, df(0L to 9L), table, "doc_id", nParts = 1)      // v0: unpartitioned era
    assert(TxLog.partitionColsOf(table).isEmpty)
    TxLog.setPartitioning(table, Seq("lang"))                            // v1: metadata only
    assert(TxLog.partitionColsOf(table) == Seq("lang"))
    assert(TxLog.snapshotAt(table).files.size == 1, "evolution must not rewrite files")
    TxLog.appendPartitioned(spark, df(10L to 19L), table,
      TxLog.partitionColsOf(table), "doc_id")                            // v2: per-lang layout
    val snap = TxLog.snapshotAt(table)
    assert(snap.files.exists(_.part.get("lang").contains("en")))
    assert(snap.files.exists(_.part.isEmpty), "old era keeps no partition values")
    // equality read across the boundary: conservative for the old era,
    // sharp for the new one — and EXACT either way
    val pruned = TxLog.readAt(spark, table, partitions = Map("lang" -> "en"))
    assert(pruned.count() == 10L) // 0,2,..,18
    assert(pruned.agg(sum("doc_id")).head.getLong(0) == (0L to 18L by 2).sum)
    // time travel resolves the partitioning of its era
    assert(TxLog.partitionColsOf(table, Some(0L)).isEmpty)
    assert(TxLog.partitionColsOf(table, Some(2L)) == Seq("lang"))
  }

  test("un-partitioning and checkpoint folding both resolve") {
    val base = Files.createTempDirectory("graft_pevo2")
    val table = base.resolve("t")
    TxLog.create(table, df(Seq(0L)).schema, Seq("lang"))                 // v0: declared partitioned
    assert(TxLog.partitionColsOf(table) == Seq("lang"))
    TxLog.setPartitioning(table, Nil)                                    // v1: un-partition future writes
    assert(TxLog.partitionColsOf(table).isEmpty)
    // push past a checkpoint boundary; the folded field must resolve
    // without scanning to v0
    (0 until 12).foreach { i =>
      TxLog.append(spark, df(Seq(100L + i)), table, "doc_id", nParts = 1)
    }
    assert(TxLog.partitionColsOf(table).isEmpty)
    assert(TxLog.partitionColsOf(table, Some(0L)) == Seq("lang"))
    TxLog.setPartitioning(table, Seq("lang"))
    assert(TxLog.partitionColsOf(table) == Seq("lang"))
  }

  test("refusals: unknown columns, renamed columns; rename refuses evolved partition cols") {
    val base = Files.createTempDirectory("graft_pevo3")
    val table = base.resolve("t")
    TxLog.append(spark, df(0L to 3L), table, "doc_id", nParts = 1)
    intercept[IllegalArgumentException] {
      TxLog.setPartitioning(table, Seq("nope"))
    }
    // a renamed column is not physical-stable -> refused as a partition col
    TxLog.renameColumn(spark, table, "payload", "body")
    intercept[IllegalArgumentException] {
      TxLog.setPartitioning(table, Seq("body"))
    }
    // and once a column IS a partition col (by evolution), renaming it is refused
    TxLog.setPartitioning(table, Seq("lang"))
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, table, "lang", "language")
    }
  }
}
