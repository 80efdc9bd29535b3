package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.domain._
import graft.pipeline.IngestionPipeline
import graft.rules.RuleMatcher
import graft.sinks.{ParquetLogRepository, ParquetSink}
import graft.sources.LocalFileSource

class StreamingSpec extends SparkSpec {

  test("event loop: S3 envelopes -> pipeline -> sink, failures isolated") {
    val base = Files.createTempDirectory("stream_spec")
    val bucket = "data-ingestion-bucket"
    Files.createDirectories(base.resolve(bucket).resolve("data"))
    Files.writeString(base.resolve(bucket).resolve("data/a.csv"), "name,age\nA,1\nB,2\n")
    Files.writeString(base.resolve(bucket).resolve("data/b.csv"), "name,age\nC,3\n")
    Files.writeString(base.resolve(bucket).resolve("data/bad.pdf"), "%PDF")

    val eventDir = Files.createDirectories(base.resolve("events"))
    def envelope(key: String) =
      s"""{"Records":[{"s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key"}}}]}"""
    Files.writeString(eventDir.resolve("e1.json"), envelope("data/a.csv"))
    Files.writeString(eventDir.resolve("e2.json"),
      envelope("data/b.csv") + "\n" + envelope("data/bad.pdf"))

    val logs = new ParquetLogRepository(base.resolve("logs").toString)
    val sink = new ParquetSink(base.resolve("sink").toString)
    val pipeline = new IngestionPipeline(
      new LocalFileSource(base.toString),
      new RuleMatcher(RuleMatcher.seedRules :+ IngestionConfigRule(".*\\.pdf$", "pdf_data")),
      sink, logs)

    var failures = List.empty[String]
    val q = new EventLoop(pipeline).start(
      spark, eventDir.toString, base.resolve("ckpt").toString,
      trigger = Trigger.AvailableNow(),
      onResult = {
        case Left((f, _)) => failures ::= f.key
        case Right(_) => ()
      })
    q.awaitTermination(120000)

    val stored = spark.read.parquet(sink.tablePath("csv_data"))
    assert(stored.count() == 3)
    assert(failures == List("data/bad.pdf"))
    assert(logs.all.count(_.status == IngestionStatus.Success) == 2)
    assert(logs.all.count(_.status == IngestionStatus.Failed) == 1)

    // restart with same checkpoint: nothing reprocessed (exactly-once source)
    val q2 = new EventLoop(pipeline).start(
      spark, eventDir.toString, base.resolve("ckpt").toString,
      trigger = Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(spark.read.parquet(sink.tablePath("csv_data")).count() == 3)
  }

  test("event loop: failed files' envelopes land in the DLQ, re-consumable") {
    val base = Files.createTempDirectory("stream_dlq")
    val bucket = "data-ingestion-bucket"
    Files.createDirectories(base.resolve(bucket).resolve("data"))
    Files.writeString(base.resolve(bucket).resolve("data/ok.csv"), "name,age\nA,1\n")
    Files.writeString(base.resolve(bucket).resolve("data/bad.pdf"), "%PDF")

    val eventDir = Files.createDirectories(base.resolve("events"))
    def envelope(key: String) =
      s"""{"Records":[{"s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key"}}}]}"""
    Files.writeString(eventDir.resolve("e1.json"),
      envelope("data/ok.csv") + "\n" + envelope("data/bad.pdf"))

    val logs = new ParquetLogRepository(base.resolve("logs").toString)
    val sink = new ParquetSink(base.resolve("sink").toString)
    val pipeline = new IngestionPipeline(
      new LocalFileSource(base.toString),
      new RuleMatcher(RuleMatcher.seedRules :+ IngestionConfigRule(".*\\.pdf$", "pdf_data")),
      sink, logs)
    val dlqDir = base.resolve("dlq").toString

    val q = new EventLoop(pipeline).start(
      spark, eventDir.toString, base.resolve("ckpt").toString,
      trigger = Trigger.AvailableNow(), deadLetterDir = Some(dlqDir))
    q.awaitTermination(120000)

    // only the failing envelope is dead-lettered, in the original S3 shape
    val dead = spark.read.schema(new EventLoop(pipeline).envelopeSchema).json(dlqDir)
    val parsed = new EventLoop(pipeline).parseEnvelopes(dead).collect()
    assert(parsed.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq((bucket, "data/bad.pdf")))
  }

  test("queue poller: successes acked, failures NOT deleted and redelivered (at-least-once)") {
    val base = Files.createTempDirectory("queue_poll")
    val bucket = "data-ingestion-bucket"
    Files.createDirectories(base.resolve(bucket).resolve("data"))
    Files.writeString(base.resolve(bucket).resolve("data/ok.csv"), "name,age\nA,1\nB,2\n")
    Files.writeString(base.resolve(bucket).resolve("data/bad.pdf"), "%PDF")

    def envelope(key: String) =
      s"""{"Records":[{"s3":{"bucket":{"name":"$bucket"},"object":{"key":"$key"}}}]}"""
    val queue = new InMemoryQueue
    queue.send(envelope("data/ok.csv"))
    queue.send(envelope("data/bad.pdf"))

    val sink = new ParquetSink(base.resolve("sink").toString)
    val pipeline = new IngestionPipeline(
      new LocalFileSource(base.toString),
      new RuleMatcher(RuleMatcher.seedRules :+ IngestionConfigRule(".*\\.pdf$", "pdf_data")),
      sink, new ParquetLogRepository(base.resolve("logs").toString))
    val results = scala.collection.mutable.ListBuffer
      .empty[Either[(FileToProcess, Throwable), IngestionPipeline#Result]]
    val poller = new QueuePoller(queue, pipeline, waitSeconds = 0, onResult = results += _)

    // Poll 1: both messages received; ok.csv acked, bad.pdf NOT deleted.
    assert(poller.pollOnce(spark) == 2)
    assert(queue.size == 1)
    assert(spark.read.parquet(sink.tablePath("csv_data")).count() == 2)
    assert(results.count(_.isRight) == 1 && results.count(_.isLeft) == 1)

    // Before the visibility timeout expires the failed message is
    // invisible; after it expires the SAME message is redelivered.
    assert(poller.pollOnce(spark) == 0)
    queue.redeliver()
    assert(poller.pollOnce(spark) == 1)
    assert(queue.size == 1) // still failing -> still queued
    assert(results.count(_.isLeft) == 2)
  }

  test("effectively-once: redelivery + idempotent wire sink stores no duplicates") {
    // The composition that upgrades the reference's semantics end to
    // end: the poller acks only on success (at-least-once) and the wire
    // sink writes deterministic _ids (idempotent), so a PARTIAL write —
    // batch 1 lands, batch 2 dies mid-file — redelivers and converges
    // to exactly-one-copy of every row.
    import graft.sinks.{MongoDbSink, StubMongoServer}
    val server = new StubMongoServer
    try {
      val base = Files.createTempDirectory("eff_once")
      val bucket = "data-ingestion-bucket"
      Files.createDirectories(base.resolve(bucket).resolve("data"))
      Files.writeString(base.resolve(bucket).resolve("data/t.csv"), "name,age\nA,1\nB,2\n")
      val queue = new InMemoryQueue
      queue.send(s"""{"Records":[{"s3":{"bucket":{"name":"$bucket"},"object":{"key":"data/t.csv"}}}]}""")
      val pipeline = new IngestionPipeline(
        new LocalFileSource(base.toString), new RuleMatcher(RuleMatcher.seedRules),
        new MongoDbSink(server.host, server.port, "ingestion_db",
          batchSize = 1, deterministicIdColumns = Seq("file_name", "name")),
        new ParquetLogRepository(base.resolve("logs").toString))
      val poller = new QueuePoller(queue, pipeline, waitSeconds = 0)
      // batchSize=1 -> one insert request per row; kill the second
      server.failRequest(2)
      assert(poller.pollOnce(spark) == 1)
      assert(queue.size == 1, "partial failure must NOT ack the message")
      val afterCrash = server.docs("ingestion_db", "csv_data").size
      assert(afterCrash <= 1, s"at most the first batch landed, got $afterCrash")
      // visibility timeout expires -> same event redelivered
      queue.redeliver()
      assert(poller.pollOnce(spark) == 1)
      assert(queue.size == 0, "successful redelivery acks")
      val docs = server.docs("ingestion_db", "csv_data")
      assert(docs.size == 2, s"exactly one copy of each row, got ${docs.size}")
    } finally server.stop()
  }

  test("queue poller: unparseable body is acked (retry can't fix it); run drains") {
    val queue = new InMemoryQueue
    queue.send("""not json at all""")
    queue.send("""{"Records":[]}""")
    val base = Files.createTempDirectory("queue_junk")
    val pipeline = new IngestionPipeline(
      new LocalFileSource(base.toString), new RuleMatcher(RuleMatcher.seedRules),
      new ParquetSink(base.resolve("sink").toString),
      new ParquetLogRepository(base.resolve("logs").toString))
    new QueuePoller(queue, pipeline, waitSeconds = 0)
      .run(spark, maxPolls = 10, stopWhenEmpty = true)
    assert(queue.size == 0)
  }

  test("dead-letter JSON escaping survives control chars and quotes in keys") {
    val pipeline = new IngestionPipeline(
      new LocalFileSource("/nonexistent"), new RuleMatcher(RuleMatcher.seedRules),
      new ParquetSink("/tmp/unused"), new ParquetLogRepository("/tmp/unused_logs"))
    val loop = new EventLoop(pipeline)
    assert(loop.esc("a\"b\\c") == "a\\\"b\\\\c")
    assert(loop.esc("line1\nline2\ttab\rcr") == "line1\\u000aline2\\u0009tab\\u000dcr")
    // Round-trip: an envelope built from a hostile key parses back intact.
    val hostile = "dir/evil\n\"key\"\twith\rstuff.csv"
    val line = s"""{"Records":[{"s3":{"bucket":{"name":"b"},"object":{"key":"${loop.esc(hostile)}"}}}]}"""
    import spark.implicits._
    val parsed = loop.parseEnvelopes(
      spark.read.schema(loop.envelopeSchema).json(Seq(line).toDS)).collect()
    assert(parsed.length == 1 && parsed.head.getString(1) == hostile)
  }

  test("streaming hourly rollup == batch e01 on the same data") {
    val batch = graft.queries.Tables.events(spark, sf0001)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    // replay the events table through a file stream
    val base = Files.createTempDirectory("stream_agg")
    graft.queries.Tables.events(spark, sf0001)
      .write.parquet(base.resolve("in").toString)
    val stream = spark.readStream
      .schema(graft.queries.Tables.events(spark, sf0001).schema)
      .parquet(base.resolve("in").toString)
    val q = StreamingAggregations.hourlyRollup(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .format("memory").queryName("hourly_spec")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly_spec")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // append mode emits only watermark-closed windows; every emitted
    // window must match batch exactly, and most windows must have closed
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, n) => assert(batch(k) == n, s"window $k") }
    assert(streamed.size >= batch.size - 3)
  }

  test("watermark drops late data: an event older than the watermark never lands") {
    import spark.implicits._
    val base = Files.createTempDirectory("stream_late")
    val in = Files.createDirectories(base.resolve("in"))
    def writeBatch(name: String, rows: Seq[(String, String, Double)], mtime: Long): Unit = {
      val df = rows.toDF("ts_s", "event_type", "value")
        .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"), col("value"))
      val tmp = Files.createTempDirectory("stream_late_tmp")
      df.coalesce(1).write.parquet(tmp.resolve("out").toString)
      val listing = Files.list(tmp.resolve("out"))
      val part = try listing
        .filter(_.getFileName.toString.startsWith("part-")).findFirst().get()
      finally listing.close()
      val dest = in.resolve(name)
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    // Spark filters late INPUT with the watermark as of the PREVIOUS
    // batch (watermarkForLateEvents) and evicts state with the current
    // one — so the late row must arrive two batches after the event time
    // that made it late. Batch 1 raises max event time to 13:00; batch 2
    // locks the late-events watermark at 11:00; batch 3's 09:30 row is
    // then genuinely late and must be dropped, not stored-and-emitted.
    writeBatch("b1.parquet", Seq(
      ("2024-01-01 10:00:00", "view", 1.0),
      ("2024-01-01 13:00:00", "view", 1.0)), mtime = 1000000L)
    writeBatch("b2.parquet", Seq(
      ("2024-01-01 14:00:00", "view", 1.0)), mtime = 2000000L)
    writeBatch("b3.parquet", Seq(
      ("2024-01-01 09:30:00", "late", 1.0),
      ("2024-01-01 15:00:00", "view", 1.0)), mtime = 3000000L)

    val schema = spark.read.parquet(in.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(in.toString)
    val q = StreamingAggregations.hourlyRollup(stream).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .format("memory").queryName("late_spec")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("late_spec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the 10:00 window closed (watermark reached 12:00) and emitted;
    // the late 09:30 event produced NO window; open windows stay unemitted.
    assert(out.contains(("2024-01-01 10:00", "view", 1L)))
    assert(!out.exists(_._2 == "late"), s"late event leaked into $out")
  }

  test("native session_window: streaming == batch on the same data (e02's native twin)") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, sf0001)
      .select(col("ts"), col("user_id"))
    def sessionize(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("e"),
        col("user_id"), col("n_events"))
    val batch = sessionize(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap

    val base = Files.createTempDirectory("stream_session")
    events.write.parquet(base.resolve("in").toString)
    val stream = spark.readStream.schema(events.schema).parquet(base.resolve("in").toString)
    val q = sessionize(stream.withWatermark("ts", "2 hours")).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .format("memory").queryName("session_spec")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("session_spec")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(streamed.nonEmpty)
    // append mode emits only watermark-closed sessions; each must match
    // the batch session exactly, and nearly all sessions must have closed
    streamed.foreach { case (k, n) => assert(batch(k) == n, s"session $k") }
    assert(streamed.size >= batch.size - 5,
      s"only ${streamed.size}/${batch.size} sessions closed")
  }

  test("stream-stream interval join == batch join on the same data (rj01's streaming twin)") {
    import spark.implicits._
    val events = graft.queries.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))

    // batch ground truth: views within 30 min BEFORE a same-user purchase
    val bp = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"), col("user_id"))
    val bv = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("ts").as("v_ts"), col("user_id"))
    val batch = bp.join(bv, Seq("user_id")).filter(
        col("v_ts") >= col("p_ts") - expr("interval 30 minutes") && col("v_ts") <= col("p_ts"))
      .select(col("p_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val base = Files.createTempDirectory("stream_join")
    events.write.parquet(base.resolve("in").toString)
    def side(tpe: String, idAs: String, tsAs: String) = spark.readStream
      .schema(events.schema).parquet(base.resolve("in").toString)
      .filter(col("event_type") === tpe)
      .select(col("event_id").as(idAs), col("ts").as(tsAs), col("user_id"))
      .withWatermark(tsAs, "1 hour")
    // both sides watermarked + a bounded time range: Spark can expire
    // join state, so state is O(window), not O(stream) — the only shape
    // that survives an unbounded 100 TB/day event stream.
    val q = side("purchase", "p_id", "p_ts").withColumnRenamed("user_id", "p_user")
      .join(side("view", "v_id", "v_ts").withColumnRenamed("user_id", "v_user"),
        expr("p_user = v_user AND v_ts >= p_ts - interval 30 minutes AND v_ts <= p_ts"))
      .select(col("p_id"), col("v_id"))
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .format("memory").queryName("join_spec")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("join_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"stream-stream join diverged: missing=${batch -- streamed} extra=${streamed -- batch}")
    assert(batch.nonEmpty)
  }

  test("streaming exact dedup: duplicates within the watermark are dropped") {
    import spark.implicits._
    val base = Files.createTempDirectory("stream_dedup")
    // two distinct texts, each sent 3 times across close timestamps
    val rows = Seq(
      (1L, "2024-01-01 10:00:00", "alpha beta"),
      (2L, "2024-01-01 10:00:10", "gamma delta"),
      (3L, "2024-01-01 10:00:20", "alpha beta"),
      (4L, "2024-01-01 10:00:30", "gamma delta"),
      (5L, "2024-01-01 10:00:40", "alpha beta"))
      .toDF("doc_id", "ts_s", "text")
      .select(col("doc_id"), col("ts_s").cast("timestamp").as("ts"), col("text"))
    rows.write.parquet(base.resolve("in").toString)
    val stream = spark.readStream.schema(rows.schema).parquet(base.resolve("in").toString)
    val q = StreamingAggregations.streamingExactDedup(stream, "ts", "text").writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .outputMode("append")
      .format("memory").queryName("dedup_spec")
      .start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_spec").select("doc_id", "text").collect()
    assert(out.length == 2, s"expected 2 unique docs, got ${out.length}")
    assert(out.map(_.getString(1)).toSet == Set("alpha beta", "gamma delta"))
  }

  test("streaming near-dup gate == batch incremental dedup (dd12's streaming twin)") {
    import graft.ops.Dedup
    val base = Files.createTempDirectory("stream_neardup")
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val arriving = docs.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    // the persisted corpus-index artifacts the production gate maintains
    val corpusFp = corpus.select(md5(col("text")).as("fp")).distinct()
    val corpusBands = Dedup.bandSignatures(corpus, "doc_id", "text")
      .select(col("band"), col("band_sig")).distinct()
    // two input files -> two micro-batches under maxFilesPerTrigger=1
    val in = base.resolve("in").toString
    arriving.filter(col("doc_id") % 20 === 7).coalesce(1).write.mode("append").parquet(in)
    arriving.filter(col("doc_id") % 20 === 17).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val out = base.resolve("out").toString
    val q = StreamingAggregations
      .incrementalNearDupGate(stream, corpusFp, corpusBands, "doc_id", "text", out)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    q.awaitTermination(120000)
    val streamedKept = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchKept = Dedup.incrementalDedupFlags(corpus, arriving, "doc_id", "text")
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedKept == batchKept,
      s"streaming gate diverged from batch: only-stream=${(streamedKept -- batchKept).take(5)} " +
        s"only-batch=${(batchKept -- streamedKept).take(5)}")
    val nArriving = arriving.count()
    assert(batchKept.nonEmpty && batchKept.size < nArriving,
      s"fixture degenerate: kept ${batchKept.size} of $nArriving")
  }
}
