package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Streamed sessionization must equal the batch lag/running-sum query
  * (e02) — including state carried across separate checkpointed runs
  * (simulated restarts). Sentinel far-future events advance the watermark
  * so every real session closes. */
class StatefulSessionizeSpec extends SparkSpec {

  test("stateful sessionize == batch e02 across checkpointed restarts") {
    import spark.implicits._
    val base = Files.createTempDirectory("sess_spec")
    val inDir = base.resolve("in").toString
    val ckpt = base.resolve("ckpt").toString
    val events = graft.queries.Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"))

    // batch truth (same 30-min gap logic as EventQueries e02)
    val batchCounts = graft.queries.EventQueries.defs("e02_sessionize")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // half the events in run 1, half + sentinels in run 2, sentinels in run 3:
    // state must survive the restarts for counts to come out right.
    val sentinelUser = 99999L
    def sentinel(daysAhead: Int) = Seq((sentinelUser,
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
        + daysAhead * 86400000L), -1L))
      .toDF("user_id", "ts", "event_id")
    // split by TIME (not id): later-half events must not be behind the
    // watermark the first run leaves; boundary-spanning sessions exercise
    // the carried state.
    val mid = lit("2024-01-15 00:00:00").cast("timestamp")
    events.filter(col("ts") < mid).write.parquet(s"$inDir/p0")
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 3)
        .parquet(s"$inDir/*")
        .as[StatefulSessionize.Ev]
      val q = StatefulSessionize.sessionize(stream, gapMinutes = 30)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .format("parquet").option("path", base.resolve("out").toString)
        .start()
      q.awaitTermination(180000)
    }
    runOnce()
    events.filter(col("ts") >= mid).write.parquet(s"$inDir/p1")
    sentinel(0).write.parquet(s"$inDir/p2")
    runOnce()
    sentinel(30).write.parquet(s"$inDir/p3")
    runOnce()

    val streamed = spark.read.parquet(base.resolve("out").toString)
      .filter(col("user_id") =!= sentinelUser)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(streamed.keySet == batchCounts.keySet)
    streamed.foreach { case (u, (nSess, _)) =>
      assert(nSess == batchCounts(u), s"user $u: streamed $nSess vs batch ${batchCounts(u)}")
    }
    // every event lands in exactly one session
    val totalEvents = streamed.values.map(_._2).sum
    assert(totalEvents == events.count())
  }
}
