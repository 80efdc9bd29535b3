package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Event-stream analytics over the `events` table — the batch shapes of
  * the streaming surface (graft.streaming runs the same aggregations
  * incrementally with watermarks): tumbling-window rollups, gap-based
  * sessionization, semi-structured JSON extraction, conditional pivots.
  *
  * Time determinism: timestamps are compared/diffed as integer epoch
  * microseconds (unix_micros / epoch_us), never as engine-local intervals;
  * outputs render time as formatted strings.
  */
object EventQueries {

  private def ts = col("ts").cast("timestamp")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- e10: gap-filled resampling + forward fill — the time-series
    // densification every monitoring/feature pipeline needs: build the
    // complete (type × hour) spine from a 1-row bounds agg (sequence +
    // explode — no engine-private series generator), left-join the real
    // hourly rollup, then forward-fill the value via the
    // count-non-null-groups trick (a running COUNT(sv) splits the
    // series at each observation; MAX within (type, group) carries it
    // forward) — the same SQL works verbatim in DuckDB, where
    // last_value(IGNORE NULLS) support differs by version.
    // Scale shape: the spine is METADATA-sized (types × hours), the
    // hourly rollup is one partial-agg shuffle of the events, and both
    // windows partition by event_type — a year of hours per type is
    // still a few-thousand-row partition at any corpus size.
    "e10_gapfill_ffill" -> ((spark: SparkSession, dir: String) => {
      val ev = t(spark, dir, "events")
      val hourly = ev.groupBy(date_trunc("hour", ts).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sv"))
      val bounds = ev.agg(date_trunc("hour", min(ts)).as("h0"),
        date_trunc("hour", max(ts)).as("h1"))
      val spine = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
      val wRun = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      spine.join(hourly, Seq("event_type", "hour"), "left_outer")
        .withColumn("grp", count(col("sv")).over(wRun))
        .withColumn("filled",
          max(col("sv")).over(Window.partitionBy(col("event_type"), col("grp"))))
        .select(col("event_type"), date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          d(coalesce(col("filled"), lit(0).cast("decimal(18,2)"))).as("filled_value"),
          col("sv").isNull.as("is_gap"))
        .orderBy("event_type", "hour")
    }),

    // ---- e12: HOPPING (sliding) windows — window(ts, 2h, 1h): every
    // event lands in exactly 2 overlapping windows. This is the
    // streaming-native windowed-agg shape (readStream + watermark runs
    // the identical expression); in batch it plans as a scan-local
    // Expand (x2) into one partial-agg shuffle. The oracle derives the
    // same two epoch-aligned window starts per event arithmetically.
    "e12_hopping_windows" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .groupBy(window(ts, "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), d(sum(dec(col("value")))).as("sum_value"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("win_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("win_start", "event_type")
    }),

    // ---- e13: NATIVE session windows — session_window(ts, gap), the
    // declarative dynamic-gap operator (streaming runs the identical
    // expression with state-store session merging). Sessions merge
    // while the next event starts within `gap` of the previous
    // ([t, t+gap) overlap), i.e. a NEW session exactly when the gap is
    // >= 6h; the oracle derives the same bounds with the
    // gaps-and-islands form (lag + running sum), so this gates Spark's
    // native operator against the portable SQL semantics. Window end =
    // last event + gap, both engines in epoch-microsecond math.
    "e13_session_windows" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .groupBy(session_window(ts, "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), d(sum(dec(col("value")))).as("sum_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
          date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("s_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "s_start")
    }),

    // ---- e01: tumbling 1-hour rollup (streaming's groupBy(window(...))
    // batch twin). Partial aggregation, single shuffle on (hour, type).
    "e01_hourly_rollup" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .groupBy(date_format(ts, "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          d(sum(dec(col("value")))).as("sum_value"),
          (d(sum(dec(col("value")))) / count(lit(1))).as("avg_value"))
        .orderBy("hour", "event_type")
    }),

    // ---- e08: volume-anomaly detection — flag hours whose event count
    // deviates more than 2 sigma from that type's hourly mean. All
    // moments are computed from EXACT integer sums (count, sum, sum of
    // squares in BIGINT), so mean/variance are single IEEE divisions and
    // sigma is one correctly-rounded sqrt — no order-dependent double
    // accumulation, hash-identical in both engines. Two shuffles total
    // (hourly rollup, then per-type moments broadcast back).
    "e08_hourly_anomalies" -> ((spark: SparkSession, dir: String) => {
      val hourly = t(spark, dir, "events")
        .groupBy(date_format(ts, "yyyy-MM-dd HH:00").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val moments = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).as("s1"),
          sum(col("n") * col("n")).as("s2"))
        .withColumn("mean", col("s1").cast("double") / col("n_hours").cast("double"))
        // FP rounding can push the variance operand a hair below zero when a
        // type's hourly counts are near-constant and large; Spark's sqrt would
        // silently yield NaN while DuckDB errors. Clamp at 0 on BOTH sides.
        .withColumn("variance", greatest(
          (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double")
            / col("n_hours").cast("double")) / col("n_hours").cast("double"),
          lit(0.0)))
        .withColumn("sigma", sqrt(col("variance")))
        .select(col("event_type"), col("mean"), col("sigma"))
      hourly.join(broadcast(moments), "event_type")
        .withColumn("z_num", col("n").cast("double") - col("mean"))
        .filter(abs(col("z_num")) > lit(2.0) * col("sigma"))
        .select(col("hour"), col("event_type"), col("n"), col("mean"), col("sigma"))
        .orderBy("hour", "event_type")
    }),

    // ---- e09: top onboarding paths — each user's first 3 events in
    // (ts, event_id) order become a path string; count users per path.
    // The sequence-mining primitive funnels (e04/e07) don't give: e04
    // checks ONE fixed order, this surfaces which orders actually occur.
    // Scale shape: one shuffle on user_id; the first-3 pick is a
    // row_number window inside that partition, the per-rank values fold
    // into one row via max(case) (no collect_list ordering semantics to
    // rely on), and the path rollup runs on the user-grain relation.
    // concat_ws skips NULLs identically in both engines, so users with
    // < 3 events keep their shorter path.
    "e09_top_paths" -> ((spark: SparkSession, dir: String) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val firstN = t(spark, dir, "events")
        .select(col("user_id"), col("event_type"), row_number().over(byUser).as("rn"))
        .filter(col("rn") <= 3)
      firstN.groupBy(col("user_id"))
        .agg(concat_ws(">",
          max(when(col("rn") === 1, col("event_type"))),
          max(when(col("rn") === 2, col("event_type"))),
          max(when(col("rn") === 3, col("event_type")))).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    }),

    // ---- e02: gap-based sessionization (30-min inactivity). The classic
    // lag -> boundary-flag -> running-sum pattern: two windows over the
    // same (user_id, time) partitioning -> ONE shuffle, two sorted passes.
    "e02_sessionize" -> ((spark: SparkSession, dir: String) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withGap = t(spark, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          (unix_micros(ts) - lag(unix_micros(ts), 1).over(byUser)).as("gap_us"))
      val withSession = withGap
        .withColumn("new_session", when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      withSession
        .groupBy(col("user_id"))
        .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- e03: semi-structured extraction from the JSON props column.
    "e03_json_extract" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // ---- e04: conditional pivot — per-user funnel counts in one pass
    // (a static-schema pivot; DataFrame.pivot() covers the dynamic case).
    "e04_user_funnel" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("views"),
          sum(when(col("event_type") === "click", 1).otherwise(0)).as("clicks"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("purchases"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("errors"),
          d(sum(when(col("event_type") === "purchase", dec(col("value"))).otherwise(lit(0).cast("decimal(18,2)")))).as("purchase_value"))
        .orderBy("user_id")
    }),

    // ---- e07: ordered funnel conversion — first view, first click AFTER
    // that view, first purchase AFTER that click; three key-joined
    // aggregates (decorrelated, no window over full history needed).
    "e07_funnel_conversion" -> ((spark: SparkSession, dir: String) => {
      val ev = t(spark, dir, "events")
        .select(col("user_id"), col("event_type"), unix_micros(ts).as("t_us"))
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("t_us")).as("view_us"))
      val firstClick = ev.filter(col("event_type") === "click").as("e")
        .join(firstView.as("v"), col("e.user_id") === col("v.user_id"))
        .filter(col("t_us") >= col("view_us"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("t_us")).as("click_us"))
      val firstPurchase = ev.filter(col("event_type") === "purchase").as("e")
        .join(firstClick.as("c"), col("e.user_id") === col("c.user_id"))
        .filter(col("t_us") >= col("click_us"))
        .groupBy(col("e.user_id").as("user_id")).agg(min(col("t_us")).as("purchase_us"))
      // n_users is a fourth 1-row aggregate cross-joined like the other
      // counters — constructing this DataFrame launches no job, and the
      // count participates in the (single) executed plan.
      val totalUsers = ev.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      totalUsers
        .crossJoin(firstView.agg(count(lit(1)).as("n_viewed")))
        .crossJoin(firstClick.agg(count(lit(1)).as("n_clicked_after_view")))
        .crossJoin(firstPurchase.agg(count(lit(1)).as("n_purchased_after_click")))
        .select(col("n_users"), col("n_viewed"), col("n_clicked_after_view"),
          col("n_purchased_after_click"))
    }),

    // ---- e06: week-over-week retention — distinct weekly actives
    // self-joined on (user, week+1); integer counts, IEEE ratio.
    "e06_weekly_retention" -> ((spark: SparkSession, dir: String) => {
      // localCheckpoint: `weekly` feeds both sides of the self-join below;
      // without it the distinct-over-events plan executes twice (same
      // expression-reuse trap as Dedup.lshCandidates).
      val weekly = t(spark, dir, "events")
        .select(col("user_id"),
          floor(datediff(to_date(ts), lit("2024-01-01").cast("date")) / 7).as("wk"))
        .distinct()
        .localCheckpoint(true)
      val nxt = weekly.select(col("user_id").as("u2"), (col("wk") - 1).as("wk2"))
      weekly.join(nxt, col("user_id") === col("u2") && col("wk") === col("wk2"), "left_outer")
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_active"), count(col("u2")).as("n_retained"))
        .withColumn("retention", col("n_retained").cast("double") / col("n_active").cast("double"))
        .orderBy("wk")
    }),

    // ---- e05: top-5 events by value per type (window top-k: per-partition
    // heap beats a global sort at scale).
    "e05_top_events_per_type" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id").asc)
      t(spark, dir, "events")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("event_type"), col("rk"), col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_type"), col("rk"))
    }),

    // ---- topk01: e05's answer via the native bounded top-k aggregate
    // (graft.functions.TopKAgg) instead of a row_number window. The
    // window form shuffles and per-partition SORTS every event to keep
    // 5 per type; topk_pairs keeps a k-bounded heap per group with
    // map-side partial aggregation, so each task ships at most k rows
    // per group into the exchange — at corpus grain the shuffle is
    // groups x k x tasks, not the table. The tiny (type, rk, id) result
    // then broadcast-joins back to the source for the payload columns.
    // Ties break by smallest event_id (in-heap and in the oracle's
    // ORDER BY), so the result is a pure function of the input set.
    "topk01_bounded_topk_per_type" -> ((spark: SparkSession, dir: String) => {
      graft.functions.VectorFunctions.registerAll(spark)
      val ev = t(spark, dir, "events")
      val top = ev.groupBy(col("event_type"))
        .agg(expr("topk_pairs(value, event_id, 5)").as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "p")))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rk"),
          col("p.id").as("event_id"))
      t(spark, dir, "events").select(col("event_id"), col("user_id"), col("value"))
        .join(broadcast(top), Seq("event_id"))
        .select(col("event_type"), col("rk"), col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_type"), col("rk"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "e13_session_windows" ->
      """WITH marked AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
        |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  strftime(MAX(ts) + INTERVAL 6 HOUR, '%Y-%m-%d %H:%M:%S') AS s_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,

    "e12_hopping_windows" ->
      """WITH ex AS (
        |  SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS win_start,
        |    event_type, value
        |  FROM events, UNNEST([0, 1]) AS t(i))
        |SELECT strftime(win_start, '%Y-%m-%d %H:%M') AS win_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e10_gapfill_ffill" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
        |  FROM events),
        |spine AS (
        |  SELECT event_type, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM (SELECT DISTINCT event_type FROM events), b),
        |hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT s.event_type, s.hour, h.n, h.sv FROM spine s
        |  LEFT JOIN hourly h USING (event_type, hour)),
        |g AS (
        |  SELECT *, COUNT(sv) OVER (PARTITION BY event_type ORDER BY hour) AS grp
        |  FROM j)
        |SELECT event_type, strftime(hour, '%Y-%m-%d %H:00') AS hour,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
        |  CAST(COALESCE(MAX(sv) OVER (PARTITION BY event_type, grp), 0) AS DOUBLE)
        |    AS filled_value,
        |  (sv IS NULL) AS is_gap
        |FROM g ORDER BY event_type, hour""".stripMargin,

    "e01_hourly_rollup" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,

    "e09_top_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, concat_ws('>',
        |    max(CASE WHEN rn = 1 THEN event_type END),
        |    max(CASE WHEN rn = 2 THEN event_type END),
        |    max(CASE WHEN rn = 3 THEN event_type END)) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path""".stripMargin,

    "e08_hourly_anomalies" ->
      """WITH hourly AS (
        |  SELECT strftime(ts, '%Y-%m-%d %H:00') AS hour, event_type, COUNT(*) AS n
        |  FROM events GROUP BY hour, event_type),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n_hours,
        |    CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2
        |  FROM hourly GROUP BY event_type),
        |mm AS (
        |  SELECT event_type,
        |    CAST(s1 AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean,
        |    sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |      / CAST(n_hours AS DOUBLE)) / CAST(n_hours AS DOUBLE), 0.0)) AS sigma
        |  FROM m)
        |SELECT hour, event_type, n, mean, sigma
        |FROM hourly JOIN mm USING (event_type)
        |WHERE abs(CAST(n AS DOUBLE) - mean) > 2.0 * sigma
        |ORDER BY hour, event_type""".stripMargin,

    "e02_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e03_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e04_user_funnel" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "e07_funnel_conversion" ->
      """WITH fv AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS view_us
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (
        |  SELECT e.user_id, MIN(epoch_us(ts)) AS click_us
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(ts) >= view_us
        |  GROUP BY e.user_id),
        |fp AS (
        |  SELECT e.user_id, MIN(epoch_us(ts)) AS purchase_us
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(ts) >= click_us
        |  GROUP BY e.user_id)
        |SELECT
        |  (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
        |  (SELECT COUNT(*) FROM fv) AS n_viewed,
        |  (SELECT COUNT(*) FROM fc) AS n_clicked_after_view,
        |  (SELECT COUNT(*) FROM fp) AS n_purchased_after_click""".stripMargin,

    "e06_weekly_retention" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    CAST(floor(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
        |  FROM events)
        |SELECT w.wk, COUNT(*) AS n_active, COUNT(n.user_id) AS n_retained,
        |  CAST(COUNT(n.user_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS retention
        |FROM weekly w LEFT OUTER JOIN weekly n
        |  ON w.user_id = n.user_id AND n.wk = w.wk + 1
        |GROUP BY w.wk ORDER BY w.wk""".stripMargin,

    "e05_top_events_per_type" ->
      """SELECT event_type, rk, event_id, user_id, value FROM (
        |  SELECT event_type, event_id, user_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,

    // Same recompute as e05 — the bounded-heap aggregate must agree
    // with the window form row for row.
    "topk01_bounded_topk_per_type" ->
      """SELECT event_type, rk, event_id, user_id, value FROM (
        |  SELECT event_type, event_id, user_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,
  )
}
