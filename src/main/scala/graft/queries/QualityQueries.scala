package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Data-quality constraint validation — the expectations pass (Deequ /
  * dbt-test style) a pipeline runs before trusting a drop: uniqueness,
  * completeness, referential integrity, domain membership, and range
  * checks, emitted as a violations report.
  *
  * The reference validates only SHAPE at parse time (ragged CSV rows,
  * zero XML records); content-level expectations are part of the
  * beyond-reference surface.
  *
  * Scale notes (100 TB):
  *  - uniqueness / completeness / domain / range fold into ONE
  *    map-side-combinable aggregation pass over the fact scan (the
  *    count-distinct is the only expanding term; swap in
  *    approx_count_distinct for a fixed-memory audit at corpus scale);
  *  - referential integrity is a LEFT ANTI join against the (broadcast)
  *    dimension key set — the corpus side streams, only keys move.
  */
object QualityQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ONE deferred plan: the in-table constraint aggregate (1 row) and
    // the referential-integrity anti-join count (1 row) meet in a
    // 1x1-row join, and stack() unpivots the scalars into report rows —
    // no driver-side .head()/.count() mid-query, so the report composes
    // like every other entry (cacheable, explainable, one submit).
    "dq01_constraint_report" -> ((spark: SparkSession, dir: String) => {
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      val agg = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup_orderkey"),
        (count(lit(1)) - count(col("o_custkey"))).as("null_custkey"),
        sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
          .as("bad_status"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("bad_price"))
      val orphans = o.join(broadcast(c.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      agg.crossJoin(broadcast(orphans))
        .selectExpr(
          """stack(5,
            |  'custkey_complete',            null_custkey,
            |  'custkey_references_customer', orphans,
            |  'orderkey_unique',             dup_orderkey,
            |  'status_in_domain',            bad_status,
            |  'totalprice_positive',         bad_price)
            |AS (check_name, n_violations)""".stripMargin)
        .withColumn("pass", col("n_violations") === 0L)
        .orderBy("check_name")
    }),

    // ---- dq02: referential-integrity audit of the WHOLE star schema —
    // per foreign-key edge, how many referencing rows exist and how
    // many are orphans (non-null FK with no matching dimension row).
    // This is the cross-table half of data-quality monitoring (dq01 is
    // the single-table half): run after every ingest batch, a nonzero
    // orphan rate is the first symptom of a broken upstream join key.
    // One LEFT OUTER join per edge folds the reference count and the
    // orphan count into a single pass (no separate anti-join + count
    // scans); genuinely-small dimension key relations broadcast
    // (DISTINCT'd first so a corrupt dimension with duplicate keys
    // cannot multiply fact rows and corrupt the audit itself); the two
    // fact-sized edges (lineitem -> orders/part) carry NO hint — the
    // planner picks a keyed shuffle (or AQE-broadcast if the key set
    // happens to fit) instead of being forced to collect a fact-sized
    // relation onto the driver at the 100 TB design point.
    // Determinism: exact counts, one IEEE division per edge.
    "dq02_referential_integrity" -> ((spark: SparkSession, dir: String) => {
      def edge(fact: DataFrame, fk: String, dim: DataFrame, pk: String,
          name: String, bcast: Boolean = true): DataFrame = {
        val keySet = dim.select(col(pk)).distinct()
          .withColumn("__hit", lit(1))
        val keys = if (bcast) broadcast(keySet) else keySet
        fact.select(col(fk))
          .join(keys, col(fk) === col(pk), "left_outer")
          .agg(count(col(fk)).as("n_refs"),
            sum(when(col(fk).isNotNull && col("__hit").isNull, 1L)
              .otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("fk_edge"), col("n_refs"), col("n_orphans"),
            (col("n_orphans").cast("double") / col("n_refs").cast("double"))
              .as("orphan_rate"))
      }
      val li = t(spark, dir, "lineitem")
      val o = t(spark, dir, "orders")
      val c = t(spark, dir, "customer")
      val su = t(spark, dir, "supplier")
      val n = t(spark, dir, "nation")
      Seq(
        edge(li, "l_orderkey", o, "o_orderkey", "lineitem_orderkey", bcast = false),
        edge(li, "l_partkey", t(spark, dir, "part"), "p_partkey", "lineitem_partkey", bcast = false),
        edge(li, "l_suppkey", su, "s_suppkey", "lineitem_suppkey"),
        edge(o, "o_custkey", c, "c_custkey", "orders_custkey"),
        edge(c, "c_nationkey", n, "n_nationkey", "customer_nationkey"),
        edge(su, "s_nationkey", n, "n_nationkey", "supplier_nationkey"),
        edge(n, "n_regionkey", t(spark, dir, "region"), "r_regionkey", "nation_regionkey"))
        .reduce(_ unionAll _)
        .orderBy("fk_edge")
    }),

    // ---- dq03: distribution DRIFT between two corpus snapshots — the
    // monitoring pass run when a new drop lands: bucket a numeric
    // column into fixed-width bins, compare the old/new bin shares, and
    // report the per-bin Population Stability Index contribution
    // ((p-q)*ln(p/q), Laplace-smoothed so empty bins stay finite). The
    // per-bin breakdown (not just the scalar PSI) is what a triage
    // actually reads — WHICH price band moved. Scale: one conditional
    // aggregation pass over the fact scan (map-side combinable, 10
    // groups), totals meet the bins in a broadcast 1-row cross join;
    // no window over the un-partitioned corpus, no second scan.
    // Determinism: bins and counts are exact integers; p, q, and the
    // PSI term are fixed-order IEEE expressions computed identically
    // in DuckDB.
    "dq03_distribution_drift" -> ((spark: SparkSession, dir: String) => {
      val o = t(spark, dir, "orders").select(
        least(floor(col("o_totalprice").cast("double") / 50000.0), lit(9.0))
          .cast("int").as("bin"),
        (col("o_orderdate") < lit("1998-01-01").cast("timestamp")).as("is_base"))
      val bins = o.groupBy(col("bin")).agg(
        sum(when(col("is_base"), 1L).otherwise(0L)).as("n_base"),
        sum(when(!col("is_base"), 1L).otherwise(0L)).as("n_curr"))
      val totals = bins.agg(sum("n_base").as("t_base"), sum("n_curr").as("t_curr"))
      bins.crossJoin(broadcast(totals))
        .select(col("bin"), col("n_base"), col("n_curr"),
          ((col("n_base") + 1).cast("double") / (col("t_base") + 10).cast("double"))
            .as("p_base"),
          ((col("n_curr") + 1).cast("double") / (col("t_curr") + 10).cast("double"))
            .as("p_curr"))
        .withColumn("psi_term",
          (col("p_base") - col("p_curr")) * log(col("p_base") / col("p_curr")))
        .orderBy("bin")
    }),

    // ---- dq04: TOTAL-VARIATION distance between two cohorts'
    // categorical distributions — the sibling of dq03's per-bin PSI
    // with a bounded, threshold-friendly statistic: TV = (1/2) sum_c
    // |p_a(c) - p_b(c)| in [0,1]. Computed HASH-SAFE: the per-category
    // cross term |n_a*t_b - n_b*t_a| is EXACT DECIMAL(38,0) — int64
    // counts widened to decimal(19,0) before the products, so the cross
    // term stays exact up to ~1e38 (cohorts of ~3e9 rows overflow an
    // int64 product; 100 TB corpora don't get near 1e19 rows, the
    // decimal bound) — and the ONLY floating-point op is one final
    // division: no accumulation-order hazard, unlike a chi-squared sum
    // of per-category doubles. The wide math stays INTERNAL: the
    // surfaced diagnostic column is int64 (driver-gate ground truth:
    // int128-backed output columns — HUGEINT / DECIMAL(38,0) — fail the
    // hash even with identical values, r10's dq04 vs r9's). One narrow
    // shuffle (category grain); totals broadcast. At 100 TB this is the
    // nightly split-health monitor: category-sized state regardless of
    // corpus size.
    "dq04_tv_drift" -> ((spark: SparkSession, dir: String) => {
      val d = t(spark, dir, "documents")
        .select(col("lang"), (col("doc_id") % 2 === 0).as("is_a"))
      val cats = d.groupBy(col("lang")).agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
      val totals = cats.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
      val dec = (c: Column) => c.cast("decimal(19,0)")
      val withT = cats.crossJoin(broadcast(totals))
        .withColumn("abs_cross",
          abs(dec(col("n_a")) * dec(col("t_b")) - dec(col("n_b")) * dec(col("t_a")))
            .cast("decimal(38,0)"))
      val tv = withT
        .agg(sum(col("abs_cross")).as("s"), max(col("t_a")).as("ta"), max(col("t_b")).as("tb"))
        .select((col("s").cast("double") /
          ((dec(col("ta")) * dec(col("tb"))).cast("double") * lit(2.0))).as("tv"))
      withT.crossJoin(broadcast(tv))
        .select(col("lang"), col("n_a"), col("n_b"),
          col("abs_cross").cast("long").as("abs_cross"), col("tv"))
        .orderBy("lang")
    }),

    // ---- dq05: EMBEDDING drift between two cohorts — the ML sibling
    // of dq04's categorical TV: per label, the L2 distance between the
    // cohorts' mean vectors (exact elementwise means via posexplode +
    // group, sim03's proven mechanics). At 100 TB this is the nightly
    // "did the embedding distribution move" monitor: state is
    // label x dim sized (grid of a few thousand cells), one shuffle at
    // that grain, corpus streams through once.
    "dq05_embedding_drift" -> ((spark: SparkSession, dir: String) => {
      val emb = t(spark, dir, "embeddings")
      val byDim = emb
        .select(col("label"), (col("vec_id") % 2 === 0).as("is_a"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(
          (sum(when(col("is_a"), col("v").cast("double")).otherwise(0.0)) /
            sum(when(col("is_a"), 1L).otherwise(0L))).as("mean_a"),
          (sum(when(!col("is_a"), col("v").cast("double")).otherwise(0.0)) /
            sum(when(!col("is_a"), 1L).otherwise(0L))).as("mean_b"))
      val counts = emb.groupBy(col("label")).agg(
        sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
      byDim.groupBy(col("label"))
        .agg(round(sqrt(sum((col("mean_a") - col("mean_b")) *
          (col("mean_a") - col("mean_b")))), 6).as("drift_l2"))
        .join(counts, "label")
        .select(col("label"), col("n_a"), col("n_b"), col("drift_l2"))
        .orderBy("label")
    }))

  private def dqEdgeSql(fact: String, fk: String, dim: String, pk: String,
      name: String): String =
    s"""SELECT '$name' AS fk_edge, COUNT(f.$fk) AS n_refs,
       |  CAST(SUM(CASE WHEN f.$fk IS NOT NULL AND d.$pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
       |FROM $fact f LEFT JOIN (SELECT DISTINCT $pk FROM $dim) d ON f.$fk = d.$pk""".stripMargin

  val oracles: Map[String, String] = Map(
    "dq02_referential_integrity" ->
      (s"""SELECT fk_edge, n_refs, n_orphans,
         |  CAST(n_orphans AS DOUBLE) / CAST(n_refs AS DOUBLE) AS orphan_rate
         |FROM (
         |${Seq(
             dqEdgeSql("lineitem", "l_orderkey", "orders", "o_orderkey", "lineitem_orderkey"),
             dqEdgeSql("lineitem", "l_partkey", "part", "p_partkey", "lineitem_partkey"),
             dqEdgeSql("lineitem", "l_suppkey", "supplier", "s_suppkey", "lineitem_suppkey"),
             dqEdgeSql("orders", "o_custkey", "customer", "c_custkey", "orders_custkey"),
             dqEdgeSql("customer", "c_nationkey", "nation", "n_nationkey", "customer_nationkey"),
             dqEdgeSql("supplier", "s_nationkey", "nation", "n_nationkey", "supplier_nationkey"),
             dqEdgeSql("nation", "n_regionkey", "region", "r_regionkey", "nation_regionkey"))
           .mkString("\nUNION ALL\n")}
         |) ORDER BY fk_edge""".stripMargin),

    // exact HUGEINT cross terms internally (int64-overflow safe); the
    // SURFACED column is BIGINT (int128-backed outputs fail the driver
    // hash); the single division is the only floating-point op
    "dq04_tv_drift" ->
      """WITH c AS (
        |  SELECT lang,
        |    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b
        |      FROM c),
        |x AS (SELECT lang, n_a, n_b,
        |        abs(CAST(n_a AS HUGEINT) * t_b - CAST(n_b AS HUGEINT) * t_a)
        |          AS abs_cross_w, t_a, t_b
        |      FROM c, t),
        |tv AS (SELECT CAST(SUM(abs_cross_w) AS DOUBLE)
        |         / (CAST(CAST(MAX(t_a) AS HUGEINT) * MAX(t_b) AS DOUBLE) * 2.0) AS tv
        |       FROM x)
        |SELECT lang, n_a, n_b, CAST(abs_cross_w AS BIGINT) AS abs_cross, tv.tv AS tv
        |FROM x, tv ORDER BY lang""".stripMargin,

    // exact per-(label,dim) cohort means, L2 over the 64-dim deltas
    "dq05_embedding_drift" ->
      """WITH ex AS (
        |  SELECT label, vec_id % 2 = 0 AS a,
        |    CAST(unnest(embedding) AS DOUBLE) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |by_dim AS (
        |  SELECT label, dim,
        |    SUM(CASE WHEN a THEN v ELSE 0 END)
        |      / SUM(CASE WHEN a THEN 1 ELSE 0 END) AS mean_a,
        |    SUM(CASE WHEN a THEN 0 ELSE v END)
        |      / SUM(CASE WHEN a THEN 0 ELSE 1 END) AS mean_b
        |  FROM ex GROUP BY label, dim),
        |cnt AS (SELECT label,
        |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM embeddings GROUP BY label)
        |SELECT c.label, n_a, n_b,
        |  round(sqrt(SUM((mean_a - mean_b) * (mean_a - mean_b))), 6) AS drift_l2
        |FROM by_dim b JOIN cnt c ON b.label = c.label
        |GROUP BY c.label, n_a, n_b ORDER BY c.label""".stripMargin,

    "dq03_distribution_drift" ->
      """WITH binned AS (
        |  SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS INT) AS bin,
        |    o_orderdate < TIMESTAMP '1998-01-01' AS is_base
        |  FROM orders),
        |bins AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        |    CAST(SUM(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) AS n_curr
        |  FROM binned GROUP BY bin),
        |tot AS (SELECT SUM(n_base) AS t_base, SUM(n_curr) AS t_curr FROM bins)
        |SELECT bin, n_base, n_curr,
        |  CAST(n_base + 1 AS DOUBLE) / CAST(t_base + 10 AS DOUBLE) AS p_base,
        |  CAST(n_curr + 1 AS DOUBLE) / CAST(t_curr + 10 AS DOUBLE) AS p_curr,
        |  (CAST(n_base + 1 AS DOUBLE) / CAST(t_base + 10 AS DOUBLE)
        |    - CAST(n_curr + 1 AS DOUBLE) / CAST(t_curr + 10 AS DOUBLE))
        |  * LN((CAST(n_base + 1 AS DOUBLE) / CAST(t_base + 10 AS DOUBLE))
        |      / (CAST(n_curr + 1 AS DOUBLE) / CAST(t_curr + 10 AS DOUBLE))) AS psi_term
        |FROM bins, tot ORDER BY bin""".stripMargin,

    "dq01_constraint_report" ->
      """SELECT check_name, n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'orderkey_unique' AS check_name,
        |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
        |  UNION ALL
        |  SELECT 'custkey_complete', COUNT(*) - COUNT(o_custkey) FROM orders
        |  UNION ALL
        |  SELECT 'custkey_references_customer',
        |    (SELECT COUNT(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'status_in_domain',
        |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'totalprice_positive',
        |    CAST(SUM(CASE WHEN o_totalprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders)
        |ORDER BY check_name""".stripMargin,
  )
}
