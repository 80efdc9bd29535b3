package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

import graft.ops.Layout

/** Storage-layout operators as gated queries — the data-SKIPPING side of
  * the 100 TB story. Compaction (file count) and Z-ordering (file
  * prunability) live in [[graft.ops.Layout]] with filesystem-level
  * specs; zorder01 gates the MATH of the layout cross-engine: the Morton
  * key and the per-file bounding boxes it induces are pure integer
  * arithmetic, so DuckDB can verify bit-for-bit what the Spark write
  * path would put in each file's parquet footer.
  *
  * Scale notes:
  *  - zorder01 assigns files by EQUAL-WIDTH z-range — file_id =
  *    (z * nFiles) div (zmax + 1) — not by global row_number: the
  *    equal-count assignment a real write uses (repartitionByRange) is
  *    sample-based and engine-private, while the equal-width rule needs
  *    only zmax (a 1-row broadcast agg) and keeps the whole plan a
  *    shuffle-on-file_id aggregation — no single-partition window over
  *    the data, deterministic at any cluster size.
  *  - the per-file (min,max) boxes ARE the demo: each file covers a
  *    compact rectangle in BOTH dims, so a 2-dim box predicate prunes on
  *    footer stats alone; contrast a date-sorted layout where every file
  *    spans the full customer range. LayoutSpec proves the actual
  *    file-level skip on disk; this query proves the numbers.
  *
  * Determinism: everything is int64 shift/mask/divide — the z-key SQL
  * string (Layout.zkeySql) is fed verbatim to BOTH engines.
  */
object LayoutQueries {

  private val nFiles = 16

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- zorder01: per-file bounding boxes of a Z-ordered orders
    // layout, keyed on (customer, order day).
    "zorder01_file_boxes" -> ((spark: SparkSession, dir: String) => {
      val zt = t(spark, dir, "orders").select(
          col("o_custkey").cast("bigint").as("x"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("bigint").as("y"))
        .withColumn("z", expr(Layout.zkeySql("x", "y")))
      val zmax = zt.agg(max(col("z")).as("zmax")) // 1 row, broadcast
      zt.crossJoin(zmax)
        .withColumn("file_id", expr(s"(z * $nFiles) div (zmax + 1)"))
        .groupBy(col("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("lo_cust"), max(col("x")).as("hi_cust"),
          (max(col("x")) - min(col("x"))).as("cust_span"),
          min(col("y")).as("lo_day"), max(col("y")).as("hi_day"),
          (max(col("y")) - min(col("y"))).as("day_span"))
        .orderBy("file_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // Same zkeySql string as the Spark side; DuckDB's // is Spark's div
    // on the all-positive operands here.
    "zorder01_file_boxes" ->
      s"""WITH zt AS (
         |  SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |zk AS (SELECT x, y, ${Layout.zkeySql("x", "y")} AS z FROM zt),
         |m AS (SELECT MAX(z) AS zmax FROM zk)
         |SELECT (z * $nFiles) // (zmax + 1) AS file_id, COUNT(*) AS n_rows,
         |  MIN(x) AS lo_cust, MAX(x) AS hi_cust, MAX(x) - MIN(x) AS cust_span,
         |  MIN(y) AS lo_day, MAX(y) AS hi_day, MAX(y) - MIN(y) AS day_span
         |FROM zk, m
         |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
