package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Relational query surface: aggregation, joins (broadcast + shuffle,
  * semi/anti/outer), sort/limit, set ops, distinct, rollup — the operator
  * families the reference gets "for free" claims over (SURVEY §2.5: absent
  * in the reference, required of the engine). TPC-H-shaped over the driver
  * tables, adapted to the available columns.
  *
  * Scale notes (100 TB thinking, per query in scaladoc below):
  * dimension tables (region/nation/customer/supplier/part) are broadcast —
  * lineitem/orders never shuffle for those joins; only genuinely large-to-
  * large joins (lineitem⋈orders) shuffle, on their join key; aggregations
  * are partial (map-side combine) by construction of groupBy+agg.
  */
object RelationalQueries {

  // exact decimal shapes chosen so products stay inside 38 digits in both
  // engines (see Tables scaladoc): extprice (12,2), rates (4,2).
  private def ep(spark: SparkSession) = col("l_extendedprice").cast("decimal(12,2)")
  private val disc = col("l_discount").cast("decimal(4,2)")
  private val tax = col("l_tax").cast("decimal(4,2)")
  private val one = lit(1).cast("decimal(4,2)")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q01: full-scan aggregate with partial (map-side) combine; no join.
    "q01_pricing_summary" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-08-06").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          d(sum(dec(col("l_quantity")))).as("sum_qty"),
          d(sum(ep(spark))).as("sum_base_price"),
          d(sum(ep(spark) * (one - disc))).as("sum_disc_price"),
          d(sum((ep(spark) * (one - disc)).cast("decimal(18,4)") * (one + tax))).as("sum_charge"),
          (d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (d(sum(ep(spark))) / count(lit(1))).as("avg_price"),
          (d(sum(disc)) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- q02: global sort + limit (top-k). At scale Spark runs this as a
    // per-partition top-k then a single-reducer merge of k-row heaps.
    "q02_top_orders" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(15)
    }),

    // ---- q03: broadcast dim (customer) ⋈ fact ⋈ fact; revenue top-k.
    "q03_shipping_priority" -> ((spark: SparkSession, dir: String) => {
      val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(spark, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(d(sum(ep(spark) * (one - disc))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), dateStr(col("o_orderdate")).as("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- q04: EXISTS -> left-semi join (no row multiplication, no
    // correlated loop; the semi join shuffles once on orderkey).
    "q04_order_priority" -> ((spark: SparkSession, dir: String) => {
      val ord = t(spark, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val lateLines = t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(lateLines,
          ord("o_orderkey") === lateLines("l_orderkey") && lateLines("l_shipdate") > ord("o_orderdate"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- q05: star join — region/nation/supplier broadcast; the only
    // shuffle joins are lineitem⋈orders and ⋈customer (both on keys).
    "q05_region_revenue" -> ((spark: SparkSession, dir: String) => {
      val region = t(spark, dir, "region")
      val nation = t(spark, dir, "nation")
      val cust = t(spark, dir, "customer")
      val ord = t(spark, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val li = t(spark, dir, "lineitem")
      val supp = t(spark, dir, "supplier")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(d(sum(ep(spark) * (one - disc))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // ---- q06: pure filter+agg — predicates push to the parquet scan.
    "q06_revenue_delta" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
        .agg(d(sum(ep(spark) * disc)).as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // ---- q07: nation-pair volume; two broadcast nation joins, group by pair+year.
    "q07_nation_volume" -> ((spark: SparkSession, dir: String) => {
      val n1 = t(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(spark, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val li = t(spark, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      li.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(d(sum(ep(spark) * (one - disc))).as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // ---- q09: profit by nation×year; part filter broadcast-joined.
    "q09_product_profit" -> ((spark: SparkSession, dir: String) => {
      val part = t(spark, dir, "part").filter(col("p_name").contains("a"))
      t(spark, dir, "lineitem")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
        .agg(d(sum(ep(spark) * (one - disc))).as("profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }),

    // ---- q10: returned-items top customers (shuffle join + topk).
    "q10_returned_items" -> ((spark: SparkSession, dir: String) => {
      val ord = t(spark, dir, "orders").filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(d(sum(ep(spark) * (one - disc))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- q13: LEFT OUTER join + two-level aggregation (distribution).
    "q13_customer_distribution" -> ((spark: SparkSession, dir: String) => {
      val ord = t(spark, dir, "orders").filter(col("o_orderstatus") =!= "P")
      val perCust = t(spark, dir, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- q14: promo share — conditional aggregation, IEEE double ratio.
    "q14_promo_revenue" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      li.join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * d(sum(when(col("p_type") === "PROMO", ep(spark) * (one - disc))
            .otherwise(lit(0).cast("decimal(18,4)")))) /
            d(sum(ep(spark) * (one - disc)))).as("promo_revenue_pct"))
    }),

    // ---- q18: large orders — HAVING on grouped fact, join back to dims.
    "q18_large_orders" -> ((spark: SparkSession, dir: String) => {
      val big = t(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(d(sum(dec(col("l_quantity")))).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      big.join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          dateStr(col("o_orderdate")).as("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(50)
    }),

    // ---- q19: OR-of-brackets predicate pushed into a broadcast join.
    "q19_brackets" -> ((spark: SparkSession, dir: String) => {
      val joined = t(spark, dir, "lineitem")
        .join(broadcast(t(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      joined.filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(5, 15) && col("p_size").between(1, 25)) ||
            (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 25) && col("p_size").between(1, 40)))
        .agg(d(sum(ep(spark) * (one - disc))).as("revenue"), count(lit(1)).as("n_lines"))
    }),

    // ---- set operations (UNION/INTERSECT/EXCEPT dedup semantics).
    "set01_union" -> ((spark: SparkSession, dir: String) => {
      val c = t(spark, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .union(c.filter(col("c_acctbal") > 9000).select(col("c_custkey")))
        .distinct()
        .orderBy("c_custkey")
    }),
    "set02_intersect" -> ((spark: SparkSession, dir: String) => {
      val c = t(spark, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .intersect(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
        .orderBy("c_custkey")
    }),
    "set03_except" -> ((spark: SparkSession, dir: String) => {
      val c = t(spark, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .except(c.filter(col("c_acctbal") > 5000).select(col("c_custkey")))
        .orderBy("c_custkey")
    }),

    // ---- set05: BAG-semantics set ops — INTERSECT ALL / EXCEPT ALL
    // keep multiplicities (per-key min / difference of counts), the
    // semantics SQL defines and the DISTINCT variants above erase. The
    // multisets are lineitem suppkey streams under two filters, so keys
    // genuinely repeat; result grain is (suppkey, copies-per-op).
    "set05_bag_ops" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem")
      val a = li.filter(col("l_quantity") >= 45).select(col("l_suppkey"))
      val b = li.filter(col("l_discount") >= 0.08).select(col("l_suppkey"))
      val ia = a.intersectAll(b).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_intersect_all"))
      val ea = a.exceptAll(b).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_except_all"))
      ia.join(ea, Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy("l_suppkey")
    }),

    // ---- q24: NULL-SAFE equality join (<=>) — the three-valued-logic
    // corner plain `=` gets wrong: rows whose join key is NULL match
    // each other under <=> (IS NOT DISTINCT FROM) instead of vanishing.
    // Keys are deterministically nulled (every suppkey % 50 = 0), and
    // the aggregate counts prove the NULL-key matches are present.
    "q24_nullsafe_join" -> ((spark: SparkSession, dir: String) => {
      val su = t(spark, dir, "supplier")
        .select(when(col("s_suppkey") % 50 === 0, lit(null)).otherwise(col("s_suppkey"))
          .as("k"), col("s_acctbal"))
      val n1 = su.as("x")
      val n2 = su.as("y")
      n1.join(n2, col("x.k") <=> col("y.k"))
        .groupBy(col("x.k").as("k"))
        .agg(count(lit(1)).as("n_pairs"),
          d(sum(dec(col("y.s_acctbal")))).as("sum_bal"))
        .orderBy(col("k").asc_nulls_first)
    }),

    // ---- q25: grouped STRING aggregation — collect_list is
    // order-nondeterministic under parallelism, so the cross-engine-safe
    // form is array_sort before the join (DuckDB: string_agg ORDER BY).
    // One partial-agg shuffle on the group key; the sort is per-group,
    // bounded by nations-per-region.
    "q25_string_agg" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "nation")
        .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_nations"),
          concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("r_name")
    }),

    // ---- exact distinct counts (shuffle-dedup; HLL sketch variant is
    // benchmarked separately since approx results can't hash-match).
    "dist01_distinct_counts" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // ---- rollup with grouping() markers folded to 'ALL' (no NULL group
    // keys in the output -> no engine-specific NULL-ordering hazards).
    "roll01_region_rollup" -> ((spark: SparkSession, dir: String) => {
      val joined = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      joined.rollup(col("r_name"), col("n_name"))
        .agg(d(sum(dec(col("o_totalprice")))).as("revenue"),
          grouping(col("r_name")).as("gr"), grouping(col("n_name")).as("gn"))
        .select(
          when(col("gr") === 1, lit("ALL")).otherwise(col("r_name")).as("region"),
          when(col("gn") === 1, lit("ALL")).otherwise(col("n_name")).as("nation"),
          col("revenue"))
        .orderBy("region", "nation")
    }),

    // ---- bloom01: runtime Bloom-filter join pruning. With a selective
    // predicate on the dimension side of a SHUFFLE join, the optimizer
    // builds bloom_filter_agg over the dim's join keys and injects
    // might_contain(<bloom>, xxhash64(l_orderkey)) into the FACT scan's
    // filter — non-joining fact rows die before the shuffle, which at
    // 100 TB is the difference between shuffling the whole fact table
    // and shuffling the ~20% that can match (PlanSpec asserts both
    // plan artifacts). The cloned session only lowers the injection
    // thresholds so the optimization fires at test scale — on a real
    // cluster the fact side clears the default 10 GB threshold by
    // itself; false positives cost nothing (the join stays exact).
    "bloom01_runtime_filter" -> ((spark: SparkSession, dir: String) => {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      val ord = t(s2, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      t(s2, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_items"),
          d(sum(ep(s2) * (one - disc))).as("revenue"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-08-06'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,

    "q03_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_revenue_delta" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND n1.n_name < n2.n_name
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q09_product_profit" ->
      """SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%a%'
        |GROUP BY n_name, year(l_shipdate) ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q13_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey
        |) GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |  AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, sum_qty
        |FROM (SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 150) big
        |JOIN orders ON big.l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,

    "q19_brackets" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 5 AND 15 AND p_size BETWEEN 1 AND 25)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 40)""".stripMargin,

    "set01_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "set02_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,

    "set03_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY c_custkey""".stripMargin,

    "set05_bag_ops" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45),
        |b AS (SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08),
        |ia AS (SELECT l_suppkey, COUNT(*) AS n_intersect_all
        |       FROM (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM b)
        |       GROUP BY l_suppkey),
        |ea AS (SELECT l_suppkey, COUNT(*) AS n_except_all
        |       FROM (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM b)
        |       GROUP BY l_suppkey)
        |SELECT COALESCE(ia.l_suppkey, ea.l_suppkey) AS l_suppkey,
        |  COALESCE(n_intersect_all, 0) AS n_intersect_all,
        |  COALESCE(n_except_all, 0) AS n_except_all
        |FROM ia FULL OUTER JOIN ea ON ia.l_suppkey = ea.l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "q24_nullsafe_join" ->
      """WITH su AS (
        |  SELECT CASE WHEN s_suppkey % 50 = 0 THEN NULL ELSE s_suppkey END AS k,
        |    s_acctbal
        |  FROM supplier)
        |SELECT x.k AS k, COUNT(*) AS n_pairs,
        |  CAST(SUM(CAST(y.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM su x JOIN su y ON x.k IS NOT DISTINCT FROM y.k
        |GROUP BY x.k ORDER BY k NULLS FIRST""".stripMargin,

    "q25_string_agg" ->
      """SELECT r_name, COUNT(*) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "dist01_distinct_counts" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,

    "roll01_region_rollup" ->
      """SELECT CASE WHEN GROUPING(r_name) = 1 THEN 'ALL' ELSE r_name END AS region,
        |  CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "bloom01_runtime_filter" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
