package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Second relational wave: global-aggregate subqueries, anti joins,
  * decorrelated scalar subqueries, UNION ALL, CUBE, RANGE window frames,
  * pivot, scalar-function library parity, and an HLL-sketch variant.
  */
object ExtendedQueries {

  private val revDec =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q11: suppliers above a global revenue share — the "compare to a
    // scalar aggregate of the whole table" shape. The total is a 1-row
    // broadcast crossJoin, NOT an empty-frame window: the window form
    // moves the whole per-supplier aggregate (grows with the corpus) to a
    // single partition, while the broadcast total stays O(1) at any scale.
    "q11_important_suppliers" -> ((spark: SparkSession, dir: String) => {
      val perSupp = t(spark, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(revDec).as("rev_dec"))
      val total = perSupp.agg(sum(col("rev_dec")).as("total_dec"))
      perSupp.crossJoin(broadcast(total))
        .filter(d(col("rev_dec")) > d(col("total_dec")) * 0.012)
        .select(col("l_suppkey"), d(col("rev_dec")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_suppkey").asc)
    }),

    // ---- q16: NOT EXISTS -> left-anti join (one shuffle on suppkey).
    "q16_idle_suppliers" -> ((spark: SparkSession, dir: String) => {
      val active = t(spark, dir, "lineitem").filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-03-01").cast("timestamp"))
        .select(col("l_suppkey"))
      t(spark, dir, "supplier")
        .join(active, col("s_suppkey") === col("l_suppkey"), "left_anti")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .orderBy("s_suppkey")
    }),

    // ---- q17: decorrelated scalar subquery — lineitems under half their
    // part's mean quantity. The correlated form re-aggregates per probe
    // row; decorrelation turns it into one aggregate + one key join.
    "q17_small_quantity" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((d(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"))
      li.join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg((d(sum(col("l_extendedprice").cast("decimal(12,2)"))) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- set04: UNION ALL (bag semantics — no dedup shuffle).
    "set04_union_all" -> ((spark: SparkSession, dir: String) => {
      val c = t(spark, dir, "customer")
      c.filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey"))
        .union(c.filter(col("c_acctbal") > 9000).select(col("c_custkey")))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("appearances"))
        .orderBy("c_custkey")
    }),

    // ---- roll02: CUBE over two dims, grouping markers folded to 'ALL'.
    "roll02_flag_status_cube" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), d(sum(dec(col("l_quantity")))).as("sum_qty"),
          grouping(col("l_returnflag")).as("gf"), grouping(col("l_linestatus")).as("gs"))
        .select(
          when(col("gf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("returnflag"),
          when(col("gs") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    // ---- w06: RANGE-framed moving window — 7-day moving revenue average
    // over integer day offsets (RANGE, not ROWS: gaps in the calendar
    // contribute nothing instead of dragging older days into the frame).
    "w06_moving_avg_revenue" -> ((spark: SparkSession, dir: String) => {
      val daily = t(spark, dir, "orders")
        .groupBy(datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("day_num"))
        .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
      // Unpartitioned window ON PURPOSE (expected "No Partition Defined"
      // WARN): input is the day-grain aggregate (~2.4k rows regardless
      // of corpus size), not the fact table — bounded by construction.
      val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
      daily.select(col("day_num"),
          d(col("rev_dec")).as("day_revenue"),
          (d(sum(col("rev_dec")).over(w)) / count(lit(1)).over(w)).as("avg_7d"))
        .orderBy("day_num")
    }),

    // ---- p01: pivot operator with pinned values (dynamic-value pivot
    // exists on the same API; pinned keeps the schema deterministic).
    "p01_cohort_pivot" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "events")
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", Seq("view", "click", "purchase", "error"))
        .agg(count(lit(1)))
        .select(col("cohort"),
          coalesce(col("view"), lit(0)).as("views"),
          coalesce(col("click"), lit(0)).as("clicks"),
          coalesce(col("purchase"), lit(0)).as("purchases"),
          coalesce(col("error"), lit(0)).as("errors"))
        .orderBy("cohort")
    }),

    // ---- fn01: scalar-function library parity in one projection
    // (string/date/math/conditional — SURVEY §2.5's "absent in reference,
    // free in Spark" claim, pinned cross-engine).
    "fn01_scalar_functions" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "orders").filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          concat(upper(col("o_orderstatus")), lit("-"), lpad(col("o_orderkey"), 8, "0")).as("tag"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since_epoch"),
          // exact-decimal scaling then decimal rounding: round() on a raw
          // DOUBLE diverges across engines at exact .xx5 boundaries
          // (Spark rounds the shortest decimal repr, DuckDB the binary
          // value — e.g. 77195.00/1000 -> 77.2 vs 77.19)
          d(round(dec(col("o_totalprice")) * lit(0.001).cast("decimal(4,3)"), 2)).as("kprice"),
          abs(col("o_totalprice") - 250000.0).as("dist_mid"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_price"),
          when(col("o_totalprice") > 250000, "high").when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"))
        .orderBy("o_orderkey")
    }),

    // ---- q22: rich customers with no orders — scalar-aggregate subquery
    // (broadcast one-row cross join) + anti join.
    "q22_idle_rich_customers" -> ((spark: SparkSession, dir: String) => {
      val cust = t(spark, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((d(sum(dec(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(spark, dir, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- g03: explicit GROUPING SETS through the registered-view SQL
    // surface (rollup/cube cover the nested shapes; this is the
    // arbitrary-sets form).
    "g03_grouping_sets" -> ((spark: SparkSession, dir: String) => {
      Tables.registerViews(spark, dir)
      spark.sql(
        """SELECT
          |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
          |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
          |  COUNT(*) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin)
    }),

    // ---- p02: UNPIVOT (melt) — the wide→long inverse of p01's pivot:
    // per-nation status revenues as three columns, melted back to
    // (nation, status, revenue) rows with Dataset.unpivot. At scale the
    // melt is a scan-local Expand (rows × 3), no shuffle beyond the
    // wide aggregate's own. The oracle uses the portable UNION ALL
    // form of the same melt.
    "p02_unpivot" -> ((spark: SparkSession, dir: String) => {
      def statusRev(s: String) = d(sum(when(col("o_orderstatus") === s,
        dec(col("o_totalprice"))).otherwise(lit(0).cast("decimal(18,2)"))))
      val wide = t(spark, dir, "orders")
        .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(statusRev("O").as("open"), statusRev("F").as("fulfilled"),
          statusRev("P").as("pending"))
      wide.unpivot(Array(col("n_name")),
          Array(col("open"), col("fulfilled"), col("pending")), "status", "revenue")
        .orderBy("n_name", "status")
    }),

    // ---- q23: correlated LATERAL join — the per-row dependent subquery
    // in FROM position (top-2 customers per nation by balance). Catalyst
    // decorrelates the DomainJoin into a ranked window under the hood;
    // the SAME SQL string runs in DuckDB.
    "q23_lateral_topk" -> ((spark: SparkSession, dir: String) => {
      Tables.registerViews(spark, dir)
      spark.sql(
        """SELECT n_name, c.c_custkey, c.c_acctbal
          |FROM nation, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer
          |  WHERE c_nationkey = n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS c
          |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
    }),

    // ---- n06: second-moment statistics computed from EXACT decimal sums
    // (sum x, sum x^2, sum xy are exact; the variance/correlation algebra
    // then runs in IEEE doubles identically in both engines — built-in
    // stddev/corr would accumulate doubles in engine-specific order).
    "n06_exact_stats" -> ((spark: SparkSession, dir: String) => {
      val q = dec(col("l_quantity"))
      val p = col("l_extendedprice").cast("decimal(12,2)")
      t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          d(sum(q)).as("sq"), d(sum(q * q)).as("sqq"),
          d(sum(p)).as("sp"), d(sum(p * p)).as("spp"),
          d(sum(q * p)).as("sqp"))
        .select(col("l_returnflag"), col("n"),
          ((col("sqq") - col("sq") * col("sq") / col("n")) / col("n")).as("var_qty"),
          sqrt((col("sqq") - col("sq") * col("sq") / col("n")) / col("n")).as("stddev_qty"),
          ((col("sqp") - col("sq") * col("sp") / col("n")) /
            (sqrt(col("sqq") - col("sq") * col("sq") / col("n")) *
              sqrt(col("spp") - col("sp") * col("sp") / col("n")))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // ---- n07: EXACT percentiles (nearest-rank count-and-pick) — engines'
    // percentile()/quantile() interpolation rules differ, so the query
    // states the definition itself: the value at sorted position
    // ceil(p*n), found by row_number against a windowed count. One
    // shuffle (the window partition); at 100 TB this is the same cost
    // shape as any per-group sort — and unlike interpolating sketches it
    // is bit-reproducible across engines and partitionings.
    "n07_exact_percentiles" -> ((spark: SparkSession, dir: String) => {
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val cw = Window.partitionBy(col("l_returnflag"))
      t(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("n")).as("n"),
          d(max(when(expr("rn = (n + 1) div 2"), dec(col("l_quantity"))))).as("median_qty"),
          d(max(when(expr("rn = (9 * n + 9) div 10"), dec(col("l_quantity"))))).as("p90_qty"),
          d(max(when(expr("rn = (99 * n + 99) div 100"), dec(col("l_quantity"))))).as("p99_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- n08: winsorization — clip a measure at its exact per-group
    // [p01, p99] (nearest-rank, same bit-reproducible machinery as n07)
    // and report the clip counts and winsorized sum a feature-cleaning
    // pass emits. Two passes over the fact column: the threshold pass is
    // n07's window shape; the clip pass re-joins the (tiny, broadcast)
    // per-group thresholds — at 100 TB the second pass is scan-local.
    "n08_winsorize" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem").select(col("l_returnflag"), col("l_extendedprice"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
      val cw = Window.partitionBy(col("l_returnflag"))
      val th = li
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .groupBy(col("l_returnflag"))
        .agg(
          d(max(when(expr("rn = (n + 99) div 100"), dec(col("l_extendedprice"))))).as("p01"),
          d(max(when(expr("rn = (99 * n + 99) div 100"), dec(col("l_extendedprice"))))).as("p99"))
      li.join(broadcast(th), "l_returnflag")
        .withColumn("clipped",
          least(greatest(col("l_extendedprice"), col("p01")), col("p99")))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          max(col("p01")).as("p01"), max(col("p99")).as("p99"),
          sum(when(col("l_extendedprice") < col("p01"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("l_extendedprice") > col("p99"), 1L).otherwise(0L)).as("n_clip_hi"),
          d(sum(dec(col("clipped")))).as("winsorized_sum"))
        .orderBy("l_returnflag")
    }),

    // ---- n10: DETERMINISTIC approximate percentiles — the
    // oracle-gateable corpus-scale path. n07's exact nearest-rank needs
    // a per-group sort of the FULL fact column; n10 sorts a
    // deterministic 1-in-10 hash sample instead (md5 of the row's
    // unique key — the same rows in any engine, any partitioning, any
    // data order), then applies n07's bit-reproducible count-and-pick
    // to the sample. Sampling error follows order-statistics theory
    // (~sqrt(p(1-p)/(r*n)) rank error at rate r); the sample RATE is
    // the scale knob — at 100 TB a 1e-4 rate leaves a sortable sample
    // with sub-percent rank error. Unlike the GK sketch (n09, kept as
    // the engine-native alternate in `alternates`), the result is a
    // pure function of the data, so DuckDB computes the identical
    // sample and the identical picks — a green gate row.
    "n10_sampled_percentiles" -> ((spark: SparkSession, dir: String) => {
      val li = t(spark, dir, "lineitem")
        .filter(expr(
          """cast(conv(substr(md5(concat(
            |  cast(l_orderkey as string), '#', cast(l_linenumber as string))),
            |  1, 8), 16, 10) as bigint) % 10 = 0""".stripMargin))
        .select(col("l_returnflag"), col("l_quantity"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      val cw = Window.partitionBy(col("l_returnflag"))
      li.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .groupBy(col("l_returnflag"))
        .agg(
          max(col("n")).as("n_sample"),
          d(max(when(expr("rn = (n + 1) div 2"), dec(col("l_quantity"))))).as("median_qty"),
          d(max(when(expr("rn = (9 * n + 9) div 10"), dec(col("l_quantity"))))).as("p90_qty"),
          d(max(when(expr("rn = (99 * n + 99) div 100"), dec(col("l_quantity"))))).as("p99_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- fn02: array-function parity (construction, slicing, search,
    // sort, join) — scan-local, codegen'd.
    "fn02_array_functions" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem").filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("sequence(1, l_linenumber)").as("seq"))
        .select(col("l_orderkey"), col("l_linenumber"),
          size(col("seq")).as("n"),
          array_join(reverse(col("seq")), ",").as("rev_str"),
          array_contains(col("seq"), 3).as("has3"),
          element_at(col("seq"), least(lit(3), size(col("seq")))).as("third_or_last"),
          array_join(slice(col("seq"), 1, 2), ",").as("first_two"),
          array_join(sort_array(col("seq"), asc = false), ",").as("desc_str"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- fn03: HIGHER-ORDER array functions — the lambda surface
    // (transform/filter/exists/aggregate) that keeps per-row array work
    // inside whole-stage codegen instead of a UDF. aggregate() is an
    // IN-ORDER left fold, so the integer sums are deterministic; every
    // expression has a DuckDB list_* twin.
    "fn03_higher_order" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          size(col("ws")).as("n_words"),
          expr("size(filter(ws, w -> length(w) >= 6))").as("n_long"),
          expr("aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x)")
            .as("total_chars"),
          expr("exists(ws, w -> w rlike '^[0-9]+$')").as("has_number"),
          expr("array_max(transform(ws, w -> length(w)))").as("max_word_len"),
          expr("cast(aggregate(transform(ws, w -> length(w)), 0, (a, x) -> a + x) as double) / size(ws)")
            .as("avg_word_len"))
        .orderBy("doc_id")
    }),

    // ---- tri01: exact triangle count + global clustering coefficient
    // over the co-supplier graph (two suppliers are adjacent when both
    // ship the same part in a near-full-quantity lineitem). Exercises
    // graft.ops.Graph.triangleStats — the degree-ordered wedge join that
    // bounds per-vertex fan-out at O(sqrt(m)) regardless of hot nodes
    // (Suri & Vassilvitskii WWW'11); complements dd07/dd13's connected
    // components as the second whole-graph analytic.
    "tri01_cosupplier_triangles" -> ((spark: SparkSession, dir: String) => {
      val ps = t(spark, dir, "lineitem").filter(col("l_quantity") >= 49)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      val pairs = ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.s") < col("y.s"))
        .select(col("x.s").as("s1"), col("y.s").as("s2"))
      graft.ops.Graph.triangleStats(pairs, "s1", "s2")
    }),

    // ---- pr01: PageRank centrality over the nation trade graph (edge
    // customer-nation -> supplier-nation, weighted by lineitem count).
    // Quantized-integer PageRank: transition probabilities are fixed at
    // 1e-6 resolution and rank mass at 1e-9, so every iteration is pure
    // int64 multiply/div/sum — bit-identical across engines, partitions,
    // and retries, where double-precision PageRank drifts by summation
    // order. Three damped (0.85) iterations, unrolled.
    // Scale shape (100 TB): the one heavy stage is the edge aggregation
    // (a map-side-combinable groupBy over the fact join); the graph
    // itself is nation-cardinality, so each iteration's join + agg runs
    // on broadcast-sized relations no matter how large the fact table.
    "pr01_nation_trade_rank" -> ((spark: SparkSession, dir: String) => {
      val S = 1000000000L // rank quantum: 1e-9
      val P = 1000000L //    probability quantum: 1e-6
      val edges = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(t(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(spark, dir, "nation").select(col("n_nationkey").as("cnk"), col("n_name").as("src")),
          col("c_nationkey") === col("cnk"))
        .join(t(spark, dir, "nation").select(col("n_nationkey").as("snk"), col("n_name").as("dst")),
          col("s_nationkey") === col("snk"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      // quantized out-probabilities; localCheckpoint: this tiny relation
      // feeds every iteration and must not replay the fact join per round
      val prob = edges
        .withColumn("wtot", sum(col("w")).over(Window.partitionBy(col("src"))))
        .select(col("src"), col("dst"), expr(s"(w * $P) div wtot").as("p"))
        .localCheckpoint(true)
      val nodes = prob.select(col("src").as("node"))
        .union(prob.select(col("dst").as("node"))).distinct()
      var r = nodes.select(col("node"), lit(S).as("r"))
      for (_ <- 1 to 3) {
        val contrib = prob.join(r, prob("src") === r("node"))
          .groupBy(col("dst")).agg(sum(expr(s"(r * p) div $P")).as("c"))
        r = nodes.join(contrib, col("node") === col("dst"), "left_outer")
          .select(col("node"),
            (lit(15L * S / 100) + expr("(85 * coalesce(c, 0L)) div 100")).as("r"))
      }
      r.withColumn("total", sum(col("r")).over(Window.partitionBy()))
        .select(col("node").as("nation"), col("r").as("rank_scaled"),
          (col("r").cast("double") / col("total").cast("double")).as("rank_share"))
        .orderBy(col("rank_scaled").desc, col("nation"))
    }),

    // ---- kcore01: 3-core of the max-quantity co-supplier graph — the
    // third whole-graph analytic (after dd07/dd13 components and tri01
    // triangles): iterative peeling to the dense backbone, the standard
    // precursor to community/spam-ring mining. Edge set is tri01's
    // co-supplier relation tightened to l_quantity >= 50 so the graph is
    // sparse enough that peeling actually peels (2-4 rounds at
    // sf0.001-0.1; >= 49 is near-complete and nothing falls out).
    // Scale shape: each peel round is one symmetric map-side-combinable
    // degree agg + two left_semi joins, all keyed, edges checkpointed per
    // round (graft.ops.Graph.kCore). The oracle unrolls 6 peel rounds —
    // peeling is monotone, so extra rounds past the fixpoint are no-ops
    // and the unroll only has to be >= the deepest observed peel depth.
    "kcore01_cosupplier_core" -> ((spark: SparkSession, dir: String) => {
      val ps = t(spark, dir, "lineitem").filter(col("l_quantity") >= 50)
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      val pairs = ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.s") < col("y.s"))
        .select(col("x.s").as("s1"), col("y.s").as("s2"))
      graft.ops.Graph.kCore(pairs, "s1", "s2", k = 3)
        .select(col("id").as("s_suppkey"), col("deg").as("core_degree"))
        .orderBy("s_suppkey")
    }),
  )

  /** HLL sketch distinct (approx_count_distinct). Sketch estimates are
    * engine-specific, so this can never hash-match a DuckDB oracle; it
    * lives OUTSIDE the driver-checked `defs` and is pinned instead by an
    * OpsSpec bounded-error test against dist01's exact counts.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
      count(lit(1)).as("n_rows"))

  /** Engine-native approximate alternates — NOT driver-gated (GK sketch
    * internals are engine-specific; DuckDB's quantile interpolates, so
    * values cannot hash-match). The oracle-gated scale path is n10's
    * deterministic hash-sampled percentiles; this stays available for
    * users who want Spark's built-in one-pass GK sketch. Plan shape
    * (no WindowExec, partial-aggregated) and rank-error-vs-n07 bounds
    * are pinned by PlanSpec. */
  val alternates: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n09_approx_percentiles" -> ((spark: SparkSession, dir: String) => {
      t(spark, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          expr("approx_percentile(cast(l_quantity as double), array(0.5, 0.9, 0.99), 10000)")
            .as("pcts"))
        // explicit double cast (n07's dec->double discipline): the
        // driver re-rolls testdata schemas between rounds, and a
        // DECIMAL l_quantity must not change this query's output types.
        .select(col("l_returnflag"), col("n"),
          element_at(col("pcts"), 1).cast("double").as("median_qty"),
          element_at(col("pcts"), 2).cast("double").as("p90_qty"),
          element_at(col("pcts"), 3).cast("double").as("p99_qty"))
        .orderBy("l_returnflag")
    }))

  val oracles: Map[String, String] = Map(
    "q11_important_suppliers" ->
      s"""SELECT l_suppkey, CAST(rev_dec AS DOUBLE) AS revenue FROM (
        |  SELECT l_suppkey, SUM($revSql) AS rev_dec,
        |    SUM(SUM($revSql)) OVER () AS total_dec
        |  FROM lineitem GROUP BY l_suppkey)
        |WHERE CAST(rev_dec AS DOUBLE) > CAST(total_dec AS DOUBLE) * 0.012
        |ORDER BY revenue DESC, l_suppkey""".stripMargin,

    "q16_idle_suppliers" ->
      """SELECT s_suppkey, s_name, s_nationkey FROM supplier
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-03-01')
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN (SELECT l_partkey AS ap_partkey,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a
        |  ON l_partkey = ap_partkey
        |WHERE l_quantity < avg_qty * 0.5""".stripMargin,

    "set04_union_all" ->
      """SELECT c_custkey, COUNT(*) AS appearances FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "roll02_flag_status_cube" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "w06_moving_avg_revenue" ->
      """SELECT day_num, CAST(rev_dec AS DOUBLE) AS day_revenue,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_7d
        |FROM (
        |  SELECT datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS day_num,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY day_num)
        |WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day_num""".stripMargin,

    "p01_cohort_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin,

    "q22_idle_rich_customers" ->
      """SELECT c_custkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM customer WHERE c_acctbal > 0)
        |AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "g03_grouping_sets" ->
      """SELECT
        |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
        |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,

    // Decimal -> double here goes through VARCHAR: a sum-of-squares
    // needs > 53 mantissa bits (e.g. 7096786968835.8685) and DuckDB's
    // direct int128-scale-divide cast can land one ulp off the correctly
    // rounded value, while its string -> double (like Spark's
    // BigDecimal.doubleValue) rounds correctly — caught by the sf0.001
    // sweep in round 5.
    "n06_exact_stats" ->
      """SELECT l_returnflag, n,
        |  ((sqq - sq * sq / n) / n) AS var_qty,
        |  sqrt((sqq - sq * sq / n) / n) AS stddev_qty,
        |  ((sqp - sq * sp / n) /
        |    (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n))) AS corr_qty_price
        |FROM (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqq,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS spp,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sqp
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,

    "n07_exact_percentiles" ->
      """SELECT l_returnflag, MAX(n) AS n,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS median_qty,
        |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS p90_qty,
        |  CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS p99_qty
        |FROM (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "n10_sampled_percentiles" ->
      """SELECT l_returnflag, MAX(n) AS n_sample,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS median_qty,
        |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS p90_qty,
        |  CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS p99_qty
        |FROM (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem
        |  WHERE ('0x' || substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || '#' || CAST(l_linenumber AS VARCHAR)),
        |      1, 8))::BIGINT % 10 = 0)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "n08_winsorize" ->
      """WITH th AS (
        |  SELECT l_returnflag,
        |    CAST(MAX(CASE WHEN rn = (n + 99) // 100 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p01,
        |    CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p99
        |  FROM (
        |    SELECT l_returnflag, l_extendedprice,
        |      ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
        |      COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |    FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l.l_returnflag, COUNT(*) AS n, MAX(p01) AS p01, MAX(p99) AS p99,
        |  CAST(SUM(CASE WHEN l_extendedprice < p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(CASE WHEN l_extendedprice > p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(CAST(SUM(CAST(least(greatest(l_extendedprice, p01), p99) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS winsorized_sum
        |FROM lineitem l JOIN th ON l.l_returnflag = th.l_returnflag
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""".stripMargin,

    "fn02_array_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  len(seq) AS n,
        |  array_to_string(list_reverse(seq), ',') AS rev_str,
        |  list_contains(seq, 3) AS has3,
        |  seq[least(3, len(seq))] AS third_or_last,
        |  array_to_string(seq[1:2], ',') AS first_two,
        |  array_to_string(list_sort(seq, 'DESC'), ',') AS desc_str
        |FROM (
        |  SELECT l_orderkey, l_linenumber, range(1, l_linenumber + 1) AS seq
        |  FROM lineitem WHERE l_orderkey % 500 = 0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p02_unpivot" ->
      """WITH wide AS (
        |  SELECT n_name,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS open,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS fulfilled,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS pending
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, status, revenue FROM (
        |  SELECT n_name, 'open' AS status, open AS revenue FROM wide
        |  UNION ALL SELECT n_name, 'fulfilled', fulfilled FROM wide
        |  UNION ALL SELECT n_name, 'pending', pending FROM wide)
        |ORDER BY n_name, status""".stripMargin,

    "q23_lateral_topk" ->
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,

    "fn03_higher_order" ->
      """SELECT doc_id,
        |  len(ws) AS n_words,
        |  CAST(len(list_filter(ws, w -> length(w) >= 6)) AS INT) AS n_long,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS INT) AS total_chars,
        |  len(list_filter(ws, w -> regexp_matches(w, '^[0-9]+$'))) > 0 AS has_number,
        |  CAST(list_max(list_transform(ws, w -> length(w))) AS INT) AS max_word_len,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws)
        |    AS avg_word_len
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "fn01_scalar_functions" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus) || '-' || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS tag,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo, dayofmonth(o_orderdate) AS dom,
        |  datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(0.001 AS DECIMAL(4,3)), 2) AS DOUBLE) AS kprice,
        |  abs(o_totalprice - 250000.0) AS dist_mid,
        |  greatest(o_totalprice, 100000.0) AS floor_price,
        |  CASE WHEN o_totalprice > 250000 THEN 'high' WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS bucket
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,

    // Triangle count is orientation-invariant, so the oracle uses the
    // simple id-order join; n_wedges comes from degrees (also
    // orientation-free). SUM over BIGINT is HUGEINT in DuckDB -> CAST.
    "tri01_cosupplier_triangles" ->
      """WITH ps AS (
        |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem WHERE l_quantity >= 49),
        |e AS (
        |  SELECT DISTINCT x.s AS a, y.s AS b FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
        |d AS (
        |  SELECT id, COUNT(*) AS deg
        |  FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) GROUP BY id),
        |tri AS (
        |  SELECT COUNT(*) AS n_triangles
        |  FROM e x JOIN e y ON x.a = y.a AND x.b < y.b JOIN e z ON z.a = x.b AND z.b = y.b)
        |SELECT (SELECT COUNT(*) FROM d) AS n_nodes,
        |  (SELECT COUNT(*) FROM e) AS n_edges,
        |  (SELECT CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) FROM d) AS n_wedges,
        |  n_triangles,
        |  CAST(n_triangles AS DOUBLE) * 3.0
        |    / CAST((SELECT SUM(deg * (deg - 1)) // 2 FROM d) AS DOUBLE) AS global_clustering
        |FROM tri""".stripMargin,

    // Quantized-integer PageRank, 3 damped iterations unrolled as CTEs.
    // Every arithmetic step is int64 multiply / integral-divide / sum —
    // identical in both engines; window SUMs cast off DuckDB's HUGEINT.
    "pr01_nation_trade_rank" ->
      """WITH e AS (
        |  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |  GROUP BY cn.n_name, sn.n_name),
        |pe AS (
        |  SELECT src, dst,
        |    (w * 1000000) // CAST(SUM(w) OVER (PARTITION BY src) AS BIGINT) AS p
        |  FROM e),
        |n AS (SELECT src AS node FROM pe UNION SELECT dst AS node FROM pe),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM n),
        |c1 AS (SELECT dst, CAST(SUM((r0.r * pe.p) // 1000000) AS BIGINT) AS c
        |       FROM pe JOIN r0 ON pe.src = r0.node GROUP BY dst),
        |r1 AS (SELECT n.node, 150000000 + (85 * COALESCE(c1.c, 0)) // 100 AS r
        |       FROM n LEFT JOIN c1 ON n.node = c1.dst),
        |c2 AS (SELECT dst, CAST(SUM((r1.r * pe.p) // 1000000) AS BIGINT) AS c
        |       FROM pe JOIN r1 ON pe.src = r1.node GROUP BY dst),
        |r2 AS (SELECT n.node, 150000000 + (85 * COALESCE(c2.c, 0)) // 100 AS r
        |       FROM n LEFT JOIN c2 ON n.node = c2.dst),
        |c3 AS (SELECT dst, CAST(SUM((r2.r * pe.p) // 1000000) AS BIGINT) AS c
        |       FROM pe JOIN r2 ON pe.src = r2.node GROUP BY dst),
        |r3 AS (SELECT n.node, 150000000 + (85 * COALESCE(c3.c, 0)) // 100 AS r
        |       FROM n LEFT JOIN c3 ON n.node = c3.dst)
        |SELECT node AS nation, r AS rank_scaled,
        |  CAST(r AS DOUBLE) / CAST(CAST(SUM(r) OVER () AS BIGINT) AS DOUBLE) AS rank_share
        |FROM r3 ORDER BY rank_scaled DESC, nation""".stripMargin,

    // 6 peel rounds unrolled (observed depth <= 4 at sf0.001-0.1; rounds
    // past the fixpoint are identity, so over-unrolling is safe). Every
    // round CTE is MATERIALIZED: round i references round i-1 three
    // times, so letting DuckDB inline them re-plans the base scan 3^6
    // times (observed as an fd-exhaustion crash, not just slowness).
    "kcore01_cosupplier_core" -> {
      val peels = (1 to 6).map { i =>
        val prev = s"e${i - 1}"
        s"""k$i AS MATERIALIZED (SELECT id FROM (
           |  SELECT id, COUNT(*) AS deg FROM (
           |    SELECT a AS id FROM $prev UNION ALL SELECT b AS id FROM $prev)
           |  GROUP BY id) WHERE deg >= 3),
           |e$i AS MATERIALIZED (SELECT a, b FROM $prev
           |  WHERE a IN (SELECT id FROM k$i) AND b IN (SELECT id FROM k$i))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH ps AS MATERIALIZED (
         |  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem WHERE l_quantity >= 50),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT x.s AS a, y.s AS b FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s),
         |$peels
         |SELECT id AS s_suppkey, COUNT(*) AS core_degree FROM (
         |  SELECT a AS id FROM e6 UNION ALL SELECT b AS id FROM e6)
         |GROUP BY id ORDER BY id""".stripMargin
    },
  )
}
