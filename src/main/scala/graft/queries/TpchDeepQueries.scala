package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Third relational wave — the TPC-H join/subquery shapes the first two
  * waves didn't cover: market-share ratio-of-conditional-aggregates (q08),
  * two-way conditional counts over a fact-fact join (q12), view + scalar-max
  * subquery (q15), correlated-threshold semi join (q20), and the
  * EXISTS / NOT-EXISTS double-correlation (q21). The driver tables are a
  * TPC-H subset (no partsupp, no l_commitdate/l_receiptdate/l_shipmode),
  * so predicates adapt — "late" is shipdate vs orderdate + interval — while
  * each query keeps the original's operator semantics.
  *
  * Scale notes per query below; shared rules from Tables.scala (exact
  * decimal sums, IEEE double ratios, total ORDER BY).
  */
object TpchDeepQueries {

  private val ep = col("l_extendedprice").cast("decimal(12,2)")
  private val disc = col("l_discount").cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q08: national market share — NATION_5's revenue share of
    // AMERICA-customer STANDARD-part revenue, by order year. Ratio of two
    // conditional exact-decimal aggregates in ONE pass (no self-join, no
    // second scan); part/supplier/nation/region broadcast, the only
    // shuffles are lineitem⋈orders⋈customer on their keys.
    "q08_market_share" -> ((spark: SparkSession, dir: String) => {
      val part = t(spark, dir, "part").filter(col("p_type") === "STANDARD")
        .select(col("p_partkey"))
      val amerCust = t(spark, dir, "customer")
        .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "AMERICA")
        .select(col("c_custkey"))
      val suppNation = t(spark, dir, "supplier")
        .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val ord = t(spark, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t(spark, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          d(sum(when(col("supp_nation") === "NATION_5", ep * (one - disc)))).as("nation_rev"),
          d(sum(ep * (one - disc))).as("total_rev"))
        .select(col("o_year"),
          (coalesce(col("nation_rev"), lit(0.0)) / col("total_rev")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // ---- q12: late-shipment priority split — lines shipped more than 90
    // days after their order date, counted into URGENT/HIGH vs other
    // priorities per return flag. One key-shuffle join, conditional
    // COUNTs (not SUM CASE — DuckDB SUM(int) is HUGEINT, breaking the
    // type-sensitive hash).
    "q12_late_priority" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem")
        .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // ---- q15: top supplier — per-supplier revenue for 1996Q1, keep the
    // max (ties included) via an empty-frame window MAX kept in EXACT
    // decimal (double equality across engines is a trap; decimal equality
    // is not). Aggregate first (60k rows -> ~100), then broadcast the
    // supplier dim onto the tiny result.
    "q15_top_supplier" -> ((spark: SparkSession, dir: String) => {
      val rev = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(ep * (one - disc)).as("rev_dec"))
      rev.withColumn("max_dec", max(col("rev_dec")).over(Window.partitionBy()))
        .filter(col("rev_dec") === col("max_dec"))
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), d(col("rev_dec")).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // ---- q20: dominant suppliers — suppliers providing more than half of
    // a red part's 1996 shipped quantity. Correlated threshold via a
    // windowed per-part total over the (part, supplier) aggregate — one
    // extra shuffle by part, NO self-join (and so no expression-reuse
    // recompute); comparison in exact decimal (sq + sq > tq).
    "q20_dominant_suppliers" -> ((spark: SparkSession, dir: String) => {
      val redParts = t(spark, dir, "part").filter(col("p_name").startsWith("red "))
        .select(col("p_partkey"))
      val perSuppPart = t(spark, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("sq"))
      val dominant = perSuppPart
        .withColumn("tq", sum(col("sq")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("sq") + col("sq") > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(spark, dir, "supplier")
        .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    }),

    // ---- q21: suppliers who kept orders waiting — for finished ('F')
    // orders, lines shipped >60 days after the order date where ANOTHER
    // supplier shares the order (EXISTS -> left-semi) but NO other
    // supplier was also late (NOT EXISTS -> left-anti). Both correlations
    // are key-equi joins on l_orderkey — shuffles, never nested loops.
    "q21_waiting_suppliers" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem")
      val l1 = li
        .join(t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("ship3"))
      l1
        .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3,
          col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3") &&
            col("ship3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(10)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q08_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  COALESCE(CAST(SUM(CASE WHEN n_s.n_name = 'NATION_5'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE), 0.0)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n_c ON c_nationkey = n_c.n_nationkey
        |JOIN region ON n_c.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n_s ON s_nationkey = n_s.n_nationkey
        |GROUP BY year(o_orderdate)
        |ORDER BY o_year""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
        |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT MAX(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q20_dominant_suppliers" ->
      """WITH per_sp AS (
        |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red %'
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_partkey, l_suppkey),
        |dominant AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, sq, SUM(sq) OVER (PARTITION BY l_partkey) AS tq FROM per_sp)
        |  WHERE sq + sq > tq)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 10""".stripMargin,
  )
}
