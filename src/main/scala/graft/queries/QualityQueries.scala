package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    }))

  val oracles: Map[String, String] = Map(
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
