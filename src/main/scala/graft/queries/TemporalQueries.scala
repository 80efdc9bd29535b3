package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Temporal join shapes Spark has no dedicated operator for, composed
  * from built-ins (the custom-operator ladder's step (a): composition
  * before custom plans):
  *
  *  - AS-OF join: "for each purchase, the latest view at-or-before it" =
  *    interleave both streams per key, one ordered window pass carrying
  *    the last-seen view forward. One shuffle on user_id, no
  *    row-multiplying join at all — this is the shape that scales where a
  *    naive theta-join explodes.
  *
  *  - RANGE join: "events within ±5 minutes" via time-bucketing: probe
  *    rows explode into the 3 candidate buckets, the join is a pure
  *    equi-join on (user, bucket), and the exact band predicate filters
  *    after. Candidate set is O(rows-per-bucket), not O(n*m).
  */
object TemporalQueries {

  private def ts = col("ts").cast("timestamp")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof01_last_view_before_purchase" -> ((spark: SparkSession, dir: String) => {
      val ev = t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(ts).as("t_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_view_us",
          max(when(col("event_type") === "view", col("t_us"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("t_us").as("purchase_us"),
          coalesce(col("last_view_us"), lit(-1L)).as("last_view_us"),
          // `div`: exact integer division — `/` would be a DOUBLE divide,
          // and double->long casts truncate in Spark but round in DuckDB
          coalesce(expr("(t_us - last_view_us) div 1000000L"), lit(-1L))
            .as("view_to_purchase_s"))
        .orderBy("user_id", "purchase_id")
    }),

    // Forward as-of with tolerance — conversion attribution: for each
    // view, the NEXT same-user purchase, counted as a conversion only
    // within a 1-hour window. Same single-shuffle interleaved-window
    // shape as asof01, looking forward instead of back.
    "asof02_next_purchase_attribution" -> ((spark: SparkSession, dir: String) => {
      val tolUs = 3600L * 1000000L
      val ev = t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(ts).as("t_us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      ev.withColumn("next_purchase_us",
          min(when(col("event_type") === "purchase", col("t_us"))).over(w))
        .filter(col("event_type") === "view")
        .withColumn("converted",
          col("next_purchase_us").isNotNull &&
            col("next_purchase_us") - col("t_us") <= tolUs)
        .select(col("user_id"), col("event_id").as("view_id"), col("t_us").as("view_us"),
          when(col("converted"), col("next_purchase_us")).otherwise(lit(-1L))
            .as("purchase_us"),
          when(col("converted"), expr("(next_purchase_us - t_us) div 1000000L"))
            .otherwise(lit(-1L)).as("view_to_purchase_s"),
          col("converted"))
        .orderBy("user_id", "view_id")
    }),

    "rj01_events_near_purchase" -> ((spark: SparkSession, dir: String) => {
      val bucketUs = 300L * 1000000L // 5-minute buckets = the band width
      val ev = t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(ts).as("t_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("t_us").as("p_us"),
          explode(array(lit(-1), lit(0), lit(1))).as("db"))
        .withColumn("bucket", expr(s"p_us div ${bucketUs}L") + col("db"))
      val candidates = ev.filter(col("event_type") =!= "purchase")
        .withColumn("bucket", expr(s"t_us div ${bucketUs}L"))
      purchases.join(candidates,
          col("p_user") === col("user_id") && purchases("bucket") === candidates("bucket"))
        .filter(abs(col("t_us") - col("p_us")) <= bucketUs)
        .groupBy(col("p_user").as("user_id"), col("purchase_id"))
        .agg(count(lit(1)).as("n_nearby"),
          sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_nearby_views"))
        .orderBy("user_id", "purchase_id")
    }),

    // ---- ij01: VARIABLE-WIDTH interval containment — "which views fall
    // inside each error's follow-up window", where the window length
    // differs per interval (1 h .. 5 h here). rj01's fixed band can't
    // express this; the scalable shape is interval BINNING: each
    // interval explodes into the time bins it covers (<= ceil(maxWidth/
    // bin) + 1 = 2 bins at these widths), points carry one bin, and the
    // join is a pure equi-join on (user, bin) with the exact containment
    // predicate as residual. Candidates are O(rows per bin), never
    // O(intervals x points); at 100 TB wider intervals just split into
    // more bins — cost tracks total interval LENGTH, not the cross
    // product. Intervals with no contained view drop out (inner-join
    // semantics, same as the oracle's).
    "ij01_interval_views" -> ((spark: SparkSession, dir: String) => {
      val binUs = 18000L * 1000000L // >= the max interval width (5 h)
      val ev = t(spark, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(ts).as("t_us"))
      val intervals = ev.filter(col("event_type") === "error")
        .select(col("user_id").as("i_user"), col("event_id").as("err_id"),
          col("t_us").as("s_us"))
        .withColumn("e_us",
          col("s_us") + (lit(3600L) + (col("err_id") % 240) * 60L) * lit(1000000L))
        .withColumn("bin",
          explode(sequence(expr(s"s_us div ${binUs}L"), expr(s"e_us div ${binUs}L"))))
      val pts = ev.filter(col("event_type") === "view")
        .withColumn("bin", expr(s"t_us div ${binUs}L"))
      intervals.join(pts,
          col("i_user") === col("user_id") && intervals("bin") === pts("bin"))
        .filter(col("t_us") >= col("s_us") && col("t_us") <= col("e_us"))
        .groupBy(col("i_user").as("user_id"), col("err_id"))
        .agg(count(lit(1)).as("n_views"),
          min(col("event_id")).as("first_view_id"),
          max(col("t_us") - col("s_us")).as("max_lag_us"))
        .orderBy("user_id", "err_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "asof01_last_view_before_purchase" ->
      """SELECT user_id, event_id AS purchase_id, t_us AS purchase_us,
        |  COALESCE(last_view_us, -1) AS last_view_us,
        |  COALESCE((t_us - last_view_us) // 1000000, -1) AS view_to_purchase_s
        |FROM (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
        |    MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
        |  FROM events)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, purchase_id""".stripMargin,

    "asof02_next_purchase_attribution" ->
      """SELECT user_id, event_id AS view_id, t_us AS view_us,
        |  CASE WHEN converted THEN next_purchase_us ELSE -1 END AS purchase_us,
        |  CASE WHEN converted THEN (next_purchase_us - t_us) // 1000000 ELSE -1 END
        |    AS view_to_purchase_s,
        |  converted
        |FROM (
        |  SELECT *, next_purchase_us IS NOT NULL
        |      AND next_purchase_us - t_us <= 3600 * CAST(1000000 AS BIGINT) AS converted
        |  FROM (
        |    SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
        |      MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |        OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_us
        |    FROM events))
        |WHERE event_type = 'view'
        |ORDER BY user_id, view_id""".stripMargin,

    // the oracle states the SEMANTIC (plain band join); the Spark plan
    // realizes it with bucketing — same rows, scalable plan
    "rj01_events_near_purchase" ->
      """SELECT p.user_id, p.event_id AS purchase_id, COUNT(*) AS n_nearby,
        |  CAST(SUM(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_nearby_views
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id AND e.event_type <> 'purchase'
        |  AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= 300 * 1000000
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.user_id, p.event_id
        |ORDER BY p.user_id, purchase_id""".stripMargin,

    // the oracle is the plain theta join; the Spark plan realizes it
    // with interval binning — same rows, linear candidates
    "ij01_interval_views" ->
      """SELECT i.user_id, i.event_id AS err_id, COUNT(*) AS n_views,
        |  MIN(p.event_id) AS first_view_id,
        |  CAST(MAX(epoch_us(p.ts) - epoch_us(i.ts)) AS BIGINT) AS max_lag_us
        |FROM events i JOIN events p
        |  ON p.user_id = i.user_id AND p.event_type = 'view'
        |  AND epoch_us(p.ts) >= epoch_us(i.ts)
        |  AND epoch_us(p.ts) <= epoch_us(i.ts)
        |      + (3600 + (i.event_id % 240) * 60) * CAST(1000000 AS BIGINT)
        |WHERE i.event_type = 'error'
        |GROUP BY i.user_id, i.event_id
        |ORDER BY i.user_id, err_id""".stripMargin,
  )
}
