package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Pins the schema-adaptive events loader: the driver's data generator has
  * shipped `events.ts` as both TIMESTAMP(NANOS) (Spark reads raw longs
  * under nanosAsLong) and plain TIMESTAMP(MICROS) across rounds, and the
  * loader must yield identical microsecond timestamps for either layout —
  * otherwise every temporal query breaks on a data regeneration. */
class TablesSpec extends SparkSpec {

  test("events loader adapts to long-nanos and native-micros ts layouts") {
    import spark.implicits._
    val micros = 1722470400123456L // 2024-08-01 00:00:00.123456 UTC

    // Layout A: ts as raw int64 nanos (what nanosAsLong yields for ns parquet).
    val nanosDir = Files.createTempDirectory("events_ns").toString
    Seq((1L, micros * 1000L + 789L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")

    // Layout B: ts as a native microsecond timestamp column.
    val microsDir = Files.createTempDirectory("events_us").toString
    Seq((1L, micros, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$microsDir/events.parquet")

    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    assert(a.schema("ts").dataType === TimestampType)
    assert(b.schema("ts").dataType === TimestampType)
    val fmt = (df: org.apache.spark.sql.DataFrame) =>
      df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).as[String].head()
    assert(fmt(a) === fmt(b))          // ns floor-division == native micros
    assert(fmt(a).endsWith("123456"))  // sub-millisecond precision survives
  }

  test("real testdata events table loads with a session-zone timestamp ts") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.limit(1).count() === 1L)
  }
}
