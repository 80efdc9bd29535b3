package graft.ops

import java.nio.file.{Files, Path}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Concurrency contracts of the multi-table transaction: overlapping
  * transactions on the SAME table pair serialize through the canonical
  * claim order (no deadlock — both sort their claims identically),
  * and transactions compose with racing single-table writers without
  * losing or duplicating a row. TxnSpec covers the crash matrix; this
  * is the live-contention half. */
class ConcurrentTxnSpec extends SparkSpec {

  private def freshTable(): Path =
    Files.createTempDirectory("graft_ctxn").resolve("tbl")

  private def idsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id").withColumn("payload", concat(lit("v"), col("doc_id")))
  }

  private def ids(table: Path): Seq[Long] =
    TxLog.readAt(spark, table).select("doc_id").collect()
      .map(_.getLong(0)).toSeq.sorted

  test("two opposing transfers on the same table pair both commit: " +
      "canonical claim order means contention, never deadlock") {
    val a = freshTable(); val b = freshTable()
    TxLog.append(spark, idsDf(0L to 9L), a, "doc_id", nParts = 1)
    TxLog.append(spark, idsDf(100L to 109L), b, "doc_id", nParts = 1)
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val f1 = pool.submit(new java.util.concurrent.Callable[Map[Path, Long]] {
      def call(): Map[Path, Long] = {
        latch.await(5, TimeUnit.SECONDS)
        TxLog.transact(spark, Seq(
          TxLog.TxnDeleteMor(a, idsDf(0L to 4L).select("doc_id"), "doc_id"),
          TxLog.TxnAppend(b, idsDf(0L to 4L), "doc_id")))
      }
    })
    val f2 = pool.submit(new java.util.concurrent.Callable[Map[Path, Long]] {
      def call(): Map[Path, Long] = {
        latch.await(5, TimeUnit.SECONDS)
        TxLog.transact(spark, Seq(
          TxLog.TxnDeleteMor(b, idsDf(100L to 104L).select("doc_id"), "doc_id"),
          TxLog.TxnAppend(a, idsDf(100L to 104L), "doc_id")))
      }
    })
    latch.countDown()
    val (v1, v2) = (f1.get(120, TimeUnit.SECONDS), f2.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // both committed, at distinct versions per table
    assert(v1.keySet == Set(a, b) && v2.keySet == Set(a, b))
    assert(v1(a) != v2(a) && v1(b) != v2(b))
    assert(ids(a) == ((5L to 9L) ++ (100L to 104L)).sorted)
    assert(ids(b) == ((0L to 4L) ++ (105L to 109L)).sorted)
  }

  test("a transaction racing single-table appenders loses no commit: " +
      "every append and the transfer all land") {
    val a = freshTable(); val b = freshTable()
    TxLog.append(spark, idsDf(0L to 9L), a, "doc_id", nParts = 1)
    TxLog.append(spark, idsDf(100L to 101L), b, "doc_id", nParts = 1)
    val latch = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val txn = pool.submit(new java.util.concurrent.Callable[Map[Path, Long]] {
      def call(): Map[Path, Long] = {
        latch.await(5, TimeUnit.SECONDS)
        TxLog.transact(spark, Seq(
          TxLog.TxnDeleteMor(a, idsDf(Seq(3L, 7L)).select("doc_id"), "doc_id"),
          TxLog.TxnAppend(b, idsDf(Seq(3L, 7L)), "doc_id")))
      }
    })
    val appenders = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          latch.await(5, TimeUnit.SECONDS)
          TxLog.append(spark, idsDf(Seq(200L + i)), b, "doc_id", nParts = 1)
        }
      })
    }
    latch.countDown()
    txn.get(120, TimeUnit.SECONDS): Unit
    appenders.foreach(_.get(120, TimeUnit.SECONDS): Unit)
    pool.shutdown()
    assert(ids(a) == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
    assert(ids(b) == Seq(3L, 7L, 100L, 101L, 200L, 201L))
    // every writer landed at a distinct version: claims serialized
    val vs = TxLog.versions(b)
    assert(vs == vs.distinct)
  }

  test("maintenance racing transactions: a compactor loops over both " +
      "tables while transfers drain one into the other — every " +
      "transfer lands, no row is lost or duplicated, compaction " +
      "serializes-or-retries") {
    val a = freshTable(); val b = freshTable()
    TxLog.append(spark, idsDf(0L to 49L), a, "doc_id", nParts = 4)
    TxLog.append(spark, idsDf(1000L to 1004L), b, "doc_id", nParts = 1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compacted = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(1)
    val maint = pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = while (!stop.get()) {
        Seq(a, b).foreach { t =>
          // a compact that loses its claim-fenced validation to a
          // concurrent transaction's DV aborts cleanly — production
          // maintenance just retries on its next pass
          try {
            TxLog.compact(spark, t, "doc_id", nParts = 2): Unit
            compacted.incrementAndGet(): Unit
          } catch { case _: IllegalStateException => () }
        }
      }
    })
    (0 until 5).foreach { i =>
      val lo = i * 10L
      val batch = idsDf(lo until (lo + 10L))
      TxLog.transact(spark, Seq(
        TxLog.TxnDeleteMor(a, batch.select("doc_id"), "doc_id"),
        TxLog.TxnAppend(b, batch, "doc_id")))
    }
    stop.set(true)
    maint.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // conservation through the storm: a fully drained, b holds every
    // transferred row plus its seeds, nothing doubled
    assert(ids(a).isEmpty)
    assert(ids(b) == ((0L to 49L) ++ (1000L to 1004L)).sorted)
    assert(compacted.get() >= 1, "no compaction ever landed — the race never happened")
    // quiesced maintenance folds everything into one clean file
    TxLog.compact(spark, b, "doc_id", nParts = 1): Unit
    assert(TxLog.snapshotAt(b).files.size == 1)
    assert(ids(b) == ((0L to 49L) ++ (1000L to 1004L)).sorted)
  }
}
