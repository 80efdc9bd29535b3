package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Change-data-capture queries over graft.ops.Merge — the "current state"
  * and "full history" views a lakehouse derives from an append-only change
  * stream. The reference appends whole documents to its stores and leaves
  * state reconstruction to them (mongodb/data_repo.rs:20-70); here the
  * merge is an engine operator.
  *
  * The change stream is derived deterministically from the test tables so
  * both engines see the identical input: every order is version 1; orders
  * with o_orderkey % 7 = 0 get a version-2 repricing (+10%, an IEEE double
  * multiply — identical bits in both engines). */
object ChangeQueries {

  private def changeStream(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val base = o.select(col("o_orderkey"), lit(1).as("version"),
      col("o_totalprice"), col("o_orderstatus"))
    val repriced = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit(2).as("version"),
        (col("o_totalprice") * lit(1.1)).as("o_totalprice"),
        col("o_orderstatus"))
    base.unionAll(repriced)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scd01: latest-wins CDC compaction — the MERGE INTO primitive.
    // One hash shuffle on the merge key; at 100 TB the shuffled volume is
    // the change stream, not the base table.
    "scd01_latest_state" -> ((spark: SparkSession, dir: String) => {
      graft.ops.Merge.latestWins(changeStream(spark, dir),
          Seq("o_orderkey"), "version", "o_orderkey")
        .orderBy("o_orderkey")
    }),

    // ---- scd02: SCD-2 interval view of the purchase event stream — each
    // user's purchases become [valid_from, valid_to) value intervals with
    // an is_current flag on the open one. Same single key shuffle; lead()
    // runs inside the per-user sorted partition.
    "scd02_purchase_history" -> ((spark: SparkSession, dir: String) => {
      val purchases = t(spark, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      graft.ops.Merge.scd2Intervals(purchases, Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current"), col("value"))
        .orderBy("user_id", "event_id")
    }),
    // ---- scd03: point-in-time reconstruction ("state AS OF T") — the
    // time-travel read a lakehouse serves from the same change stream:
    // filter changes at-or-before T, then latest-wins per key. The
    // filter pushes into the scan (partition/row-group pruning on ts at
    // scale), so reconstruction cost tracks |changes <= T|, and the one
    // shuffle is the same latestWins key shuffle as scd01.
    "scd03_state_as_of" -> ((spark: SparkSession, dir: String) => {
      val asOf = "2024-01-15 00:00:00"
      val purchases = t(spark, dir, "events")
        .filter(col("event_type") === "purchase" &&
          col("ts") <= to_timestamp(lit(asOf)))
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      graft.ops.Merge.latestWins(purchases, Seq("user_id"), "ts", "event_id")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("state_ts"),
          col("value"))
        .orderBy("user_id")
    }),
    // ---- scd04: latest-wins WITH delete tombstones — the full CDC
    // op-log semantics (I/U/D): the latest version per key decides, and
    // if it is a delete the key vanishes from current state (a later
    // re-insert would resurrect it, which filter-after-latest preserves).
    // Same single key shuffle as scd01; the tombstone filter is a
    // post-window predicate, no extra pass.
    "scd04_tombstone_state" -> ((spark: SparkSession, dir: String) => {
      val o = t(spark, dir, "orders")
      val stream = changeStream(spark, dir).withColumn("op", lit("U"))
        .unionAll(o.filter(col("o_orderkey") % 13 === 0)
          .select(col("o_orderkey"), lit(3).as("version"),
            col("o_totalprice"), col("o_orderstatus"))
          .withColumn("op", lit("D")))
      graft.ops.Merge.latestWins(stream, Seq("o_orderkey"), "version", "o_orderkey")
        .filter(col("op") =!= "D")
        .select(col("o_orderkey"), col("version"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy("o_orderkey")
    }),

    // ---- ivm01: incremental view maintenance with retractions — keep a
    // per-event_type (count, sum) materialized view current by merging a
    // SIGNED delta instead of recomputing. Deterministic split: the view
    // was built over event_id % 10 <> 0; the delta INSERTS the % 10 = 0
    // rows and RETRACTS the % 7 = 0 rows already in the view. The gate
    // is cross-METHOD as well as cross-engine: Spark computes the
    // algebraic merge (view + Σsign, view + Σsign·value), DuckDB
    // recomputes the final state from scratch — the hashes agree only if
    // delta maintenance is exactly equivalent to recomputation. Exact
    // DECIMAL sums make the algebra order-independent, so "base + delta"
    // and "one pass" cannot drift by float association.
    // 100 TB shape: the view update scans ONLY the delta (two skinny
    // aggregates + an event_type-grain outer join); recomputation would
    // scan the world. This is the foreachBatch pattern for keeping
    // serving aggregates fresh under a CDC stream.
    "ivm01_incremental_view" -> ((spark: SparkSession, dir: String) => {
      val ev = t(spark, dir, "events")
      val baseAgg = ev.filter(col("event_id") % 10 =!= 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("s"))
      val delta = ev.filter(col("event_id") % 10 === 0)
          .select(col("event_type"), lit(1L).as("sign"), dec(col("value")).as("v"))
        .unionByName(ev.filter(col("event_id") % 10 =!= 0 && col("event_id") % 7 === 0)
          .select(col("event_type"), lit(-1L).as("sign"), dec(col("value")).as("v")))
      val deltaAgg = delta.groupBy(col("event_type"))
        .agg(sum(col("sign")).as("dn"),
          sum(col("sign") * col("v")).as("ds"),
          sum(when(col("sign") === -1L, 1L).otherwise(0L)).as("n_retracted"))
      baseAgg.join(deltaAgg, Seq("event_type"), "full_outer")
        .select(col("event_type"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_final"),
          d(coalesce(col("s"), lit(0).cast("decimal(18,2)")) +
            coalesce(col("ds"), lit(0).cast("decimal(18,2)"))).as("sum_final"),
          coalesce(col("n_retracted"), lit(0L)).as("n_retracted"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    "scd01_latest_state" ->
      """WITH changes AS (
        |  SELECT o_orderkey, 1 AS version, o_totalprice, o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2 AS version,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey, version, o_totalprice, o_orderstatus FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, o_orderkey DESC) AS rn
        |  FROM changes)
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,

    "scd02_purchase_history" ->
      """WITH p AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  (lead(ts) OVER w IS NULL) AS is_current,
        |  value
        |FROM p
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, event_id""".stripMargin,

    "scd03_state_as_of" ->
      """WITH p AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase' AND ts <= TIMESTAMP '2024-01-15 00:00:00')
        |SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS state_ts, value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM p)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "scd04_tombstone_state" ->
      """WITH changes AS (
        |  SELECT o_orderkey, 1 AS version, o_totalprice, o_orderstatus, 'U' AS op FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2 AS version,
        |         o_totalprice * CAST(1.1 AS DOUBLE), o_orderstatus, 'U'
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3 AS version, o_totalprice, o_orderstatus, 'D'
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT o_orderkey, version, o_totalprice, o_orderstatus FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY version DESC, o_orderkey DESC) AS rn
        |  FROM changes)
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,

    // Direct RECOMPUTE of the final state (not the delta algebra): final
    // set = inserts (id%10=0) ∪ (base \ retractions) = id%10=0 OR id%7<>0.
    "ivm01_incremental_view" ->
      """SELECT event_type,
        |  COUNT(*) FILTER (WHERE event_id % 10 = 0 OR event_id % 7 <> 0) AS n_final,
        |  CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
        |    FILTER (WHERE event_id % 10 = 0 OR event_id % 7 <> 0), 0) AS DOUBLE)
        |    AS sum_final,
        |  COUNT(*) FILTER (WHERE event_id % 10 <> 0 AND event_id % 7 = 0) AS n_retracted
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
