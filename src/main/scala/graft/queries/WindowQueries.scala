package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Window-function surface: ranking (row_number / dense_rank), framed
  * running aggregates, lag/lead, and windowed ratios — all absent from the
  * reference (SURVEY §2.5) and provided here via Catalyst's native window
  * exec (partition-shuffle once, then sorted per-partition streaming; no
  * driver-side state).
  *
  * Determinism: every window ORDER BY carries a unique tie-break key, and
  * running sums stay in exact decimal until the final double cast.
  */
object WindowQueries {

  private def revenue = sum(
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- w01: top-3 suppliers per nation by revenue (rank + filter).
    // Shuffles once on suppkey for the agg, once on nation for the window.
    "w01_top_suppliers_per_nation" -> ((spark: SparkSession, dir: String) => {
      val perSupp = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
        .agg(d(revenue).as("revenue"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("revenue").desc, col("s_suppkey").asc)
      perSupp.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("n_name"), col("rk"), col("s_suppkey"), col("s_name"), col("revenue"))
        .orderBy(col("n_name"), col("rk"))
    }),

    // ---- w02: daily revenue + exact-decimal running total.
    "w02_running_daily_revenue" -> ((spark: SparkSession, dir: String) => {
      val daily = t(spark, dir, "orders")
        .groupBy(dateStr(col("o_orderdate")).as("day"))
        .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
      // Unpartitioned window ON PURPOSE (the "No Partition Defined"
      // WARN in logs is expected): it runs over the DAY-GRAIN aggregate
      // (cardinality = #calendar days, ~2.4k rows at any corpus size),
      // never the fact table — bounded by construction.
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("day"), d(col("rev_dec")).as("day_revenue"),
          d(sum(col("rev_dec")).over(w)).as("running_revenue"))
        .orderBy(col("day"))
    }),

    // ---- w03: lag over customer order history (prev order's price).
    "w03_customer_order_lag" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), dateStr(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"),
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)).as("prev_totalprice"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- w04: dense_rank of customers by balance within segment.
    "w04_segment_balance_rank" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(spark, dir, "customer")
        .withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 5)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"), col("c_custkey"))
    }),

    // ---- w05: windowed ratio — supplier's share of its nation's revenue.
    "w05_supplier_nation_share" -> ((spark: SparkSession, dir: String) => {
      val perSupp = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("s_suppkey"))
        .agg(revenue.as("rev_dec"))
      val w = Window.partitionBy(col("n_name"))
      perSupp
        .select(col("n_name"), col("s_suppkey"), d(col("rev_dec")).as("revenue"),
          (d(col("rev_dec")) / d(sum(col("rev_dec")).over(w))).as("nation_share"))
        .orderBy(col("n_name"), col("s_suppkey"))
    }),

    // ---- w07: distribution window functions — percent_rank, cume_dist,
    // ntile quartiles of supplier balances per nation. All rank-derived
    // (exact integer ranks over a total (s_acctbal, s_suppkey) order,
    // single IEEE divisions), so deterministic cross-engine. One shuffle
    // on the partition key, like every window here.
    "w07_distribution_windows" -> ((spark: SparkSession, dir: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey")).orderBy(col("s_acctbal"), col("s_suppkey"))
      t(spark, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          ntile(4).over(w).as("quartile"))
        .orderBy("s_nationkey", "s_suppkey")
    }),

    // ---- w08: positional window functions with PINNED frames —
    // first_value/last_value/nth_value read a specific row of the
    // ordered partition, where the default RANGE frame would make
    // last_value degenerate (current row); the explicit ROWS frame and
    // the (s_acctbal, s_suppkey) total order make every value unique
    // and engine-agnostic; lead's default argument covers the partition
    // tail.
    "w08_positional_windows" -> ((spark: SparkSession, dir: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey")).orderBy(col("s_acctbal"), col("s_suppkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      t(spark, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
          first(col("s_suppkey")).over(w).as("poorest_supp"),
          last(col("s_suppkey")).over(w).as("richest_supp"),
          nth_value(col("s_suppkey"), 2).over(w).as("second_supp"),
          lead(col("s_suppkey"), 2, -1L).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("s_nationkey"))
              .orderBy(col("s_acctbal"), col("s_suppkey"))).as("two_ahead"))
        .orderBy("s_nationkey", "s_suppkey")
    }),
  )

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val oracles: Map[String, String] = Map(
    "w08_positional_windows" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  first_value(s_suppkey) OVER w AS poorest_supp,
        |  last_value(s_suppkey) OVER w AS richest_supp,
        |  nth_value(s_suppkey, 2) OVER w AS second_supp,
        |  lead(s_suppkey, 2, -1) OVER (PARTITION BY s_nationkey
        |    ORDER BY s_acctbal, s_suppkey) AS two_ahead
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,

    "w01_top_suppliers_per_nation" ->
      s"""SELECT n_name, rk, s_suppkey, s_name, revenue FROM (
        |  SELECT n_name, s_suppkey, s_name, revenue,
        |    ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS rk
        |  FROM (
        |    SELECT n_name, s_suppkey, s_name, CAST(SUM($revSql) AS DOUBLE) AS revenue
        |    FROM lineitem
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    GROUP BY n_name, s_suppkey, s_name))
        |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin,

    "w02_running_daily_revenue" ->
      """SELECT day, CAST(rev_dec AS DOUBLE) AS day_revenue,
        |  CAST(SUM(rev_dec) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        |FROM (
        |  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY day)
        |ORDER BY day""".stripMargin,

    "w03_customer_order_lag" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
        |  COALESCE(LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1.0) AS prev_totalprice
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w04_segment_balance_rank" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer)
        |WHERE rk <= 5 ORDER BY c_mktsegment, rk, c_custkey""".stripMargin,

    "w05_supplier_nation_share" ->
      s"""SELECT n_name, s_suppkey, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY n_name) AS DOUBLE) AS nation_share
        |FROM (
        |  SELECT n_name, s_suppkey, SUM($revSql) AS rev_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name, s_suppkey)
        |ORDER BY n_name, s_suppkey""".stripMargin,

    "w07_distribution_windows" ->
      """SELECT s_nationkey, s_suppkey, s_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  ntile(4) OVER w AS quartile
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
  )
}
