package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** transformWithState (Spark 4 arbitrary-state API, RocksDB-backed) must
  * equal the batch groupBy count — including MapState carried across a
  * checkpointed restart. */
class StatefulCountersSpec extends SparkSpec {

  test("transformWithState typed counters == batch counts across a restart") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Files.createTempDirectory("tws_spec")
      val events = graft.queries.Tables.events(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("event_id"))
      val batchCounts = events.groupBy("user_id", "event_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

      // half the events per run; the MapState must survive the restart
      // (and the multi-batch run: maxFilesPerTrigger=1 over 2 files)
      events.filter(col("event_id") % 2 === 0).repartition(2)
        .write.parquet(base.resolve("in/p0").toString)
      val outDir = base.resolve("out").toString
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(base.resolve("in").toString + "/*")
          .as[StatefulCounters.Ev]
        val q = StatefulCounters.typedCounts(stream).writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .outputMode("update")
          // memory sink can't recover from a checkpoint; foreachBatch can
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulCounters.TypedCount], _: Long) =>
            batch.write.mode("append").parquet(outDir): Unit
          }
          .start()
        q.awaitTermination(180000)
      }
      runOnce()
      events.filter(col("event_id") % 2 === 1).repartition(2)
        .write.parquet(base.resolve("in/p1").toString)
      runOnce()

      // counters are monotone, so the final value per key is the max
      // emitted across both runs' update streams
      val streamed = spark.read.parquet(outDir)
        .groupBy("user_id", "event_type").agg(max("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batchCounts,
        s"streamed ${streamed.size} pairs, batch ${batchCounts.size}")

      // the checkpointed MapState is also inspectable OFFLINE through the
      // state data source — the ops path for debugging a live pipeline's
      // state without replaying it. The final counters read back from
      // RocksDB must equal the batch truth too.
      val stateRows = spark.read.format("statestore")
        .option("path", base.resolve("ckpt").toString)
        .option("stateVarName", "counts")
        .load()
        .select(col("key.value").as("user_id"),
          col("user_map_key.value").as("event_type"),
          col("user_map_value.value").as("n"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(stateRows == batchCounts,
        s"offline state read ${stateRows.size} pairs, batch ${batchCounts.size}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("ListState ring buffer keeps the last N ids across batches and restarts") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Files.createTempDirectory("tws_list_spec")
      val events = graft.queries.Tables.events(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("event_id"))
      // batch 1 = even ids (sorted in-processor), batch 2 = odd ids; the
      // expected final buffer per user is last-3 of (evens ++ odds).
      val byUser = events.select("user_id", "event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, rows) =>
          val ids = rows.map(_._2)
          val arrival = ids.filter(_ % 2 == 0).sorted ++ ids.filter(_ % 2 == 1).sorted
          u -> arrival.takeRight(3).toSet
        }
      val outDir = base.resolve("out").toString
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(events.schema)
          .parquet(base.resolve("in").toString + "/*")
          .as[StatefulCounters.Ev]
        val q = StatefulCounters.recentEvents(stream, n = 3).writeStream
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", base.resolve("ckpt").toString)
          .outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulCounters.Recent], _: Long) =>
            batch.write.mode("append").parquet(outDir): Unit
          }
          .start()
        q.awaitTermination(180000)
      }
      events.filter(col("event_id") % 2 === 0).coalesce(1)
        .write.parquet(base.resolve("in/p0").toString)
      runOnce()
      events.filter(col("event_id") % 2 === 1).coalesce(1)
        .write.parquet(base.resolve("in/p1").toString)
      runOnce() // ListState must survive the checkpointed restart
      // the buffers live in RocksDB: read them back OFFLINE and compare
      val stateRows = spark.read.format("statestore")
        .option("path", base.resolve("ckpt").toString)
        .option("stateVarName", "recent")
        .load()
      val buffers = stateRows
        .select(col("key.value").as("user_id"), col("list_element.value").as("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).toSet }
      assert(buffers == byUser,
        s"state buffers diverge, e.g. ${buffers.toSeq.sortBy(_._1).take(2)} vs " +
          s"${byUser.toSeq.sortBy(_._1).take(2)}")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("event-time timers finalize idle users' counters exactly once") {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = Files.createTempDirectory("tws_timer_spec")
      val events = graft.queries.Tables.events(spark, sf0001)
        .select(col("user_id"), col("event_type"), col("ts"))
      val batchCounts = events.groupBy("user_id", "event_type").count()
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

      events.write.parquet(base.resolve("in/p0").toString)
      // a far-future sentinel advances the watermark past every real
      // user's idle deadline, firing all timers (watermark lags one batch
      // for input filtering but not for timer eviction)
      Seq((99999L, "noop", java.sql.Timestamp.valueOf("2030-01-01 00:00:00")))
        .toDF("user_id", "event_type", "ts")
        .write.parquet(base.resolve("in/p1").toString)

      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(base.resolve("in").toString + "/*")
        .as[StatefulCounters.EvT]
      val outDir = base.resolve("out").toString
      val q = StatefulCounters.finalizedCounts(stream, idleGapMinutes = 30).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulCounters.TypedCount], _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .start()
      q.awaitTermination(180000)

      val finals = spark.read.parquet(outDir)
        .filter(col("user_id") =!= 99999L)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(finals == batchCounts,
        s"finalized ${finals.size} pairs, batch ${batchCounts.size}")
      // exactly once: no (user, type) pair appears twice
      val n = spark.read.parquet(outDir).filter(col("user_id") =!= 99999L).count()
      assert(n == finals.size, "duplicate finalization rows")
    } finally {
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
