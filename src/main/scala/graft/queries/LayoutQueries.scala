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
    // ---- zorder02: the PAYOFF metric of the Z-order layout — for a
    // CUSTOMER-SELECTIVE box probe (x in the [5/16, 11/32] span slice,
    // a ~3% customer band sitting inside one x-quarter; y spanning the
    // middle HALF of all days — the predicate shape a day-sorted
    // layout cannot prune at all), how many files does footer pruning
    // skip under the Z-ordered
    // layout vs a single-dim day-sorted layout of the SAME data into
    // the SAME file count? A file is skippable iff its bounding box
    // misses the probe box. The day-sorted layout prunes the day dim
    // only (every file spans the full customer range), so its skip
    // count is bounded by the probe's day selectivity; the Z layout
    // prunes BOTH dims. This query states those numbers exactly —
    // LayoutSpec proves the same skip on real parquet footers on disk.
    // Determinism: pure int64 arithmetic end to end; the probe box is
    // SPAN-RELATIVE (second quartile-ish slice of each dim) so the
    // query stays meaningful under any data generation. The z-key here
    // interleaves dims NORMALIZED to a common 8-bit grid — interleaving
    // raw values with unequal bit-widths (14-bit custkey vs 12-bit day)
    // lets the wide dim dominate the key and costs most of the
    // pruning; normalize-then-interleave is the standard recipe
    // (zorder01 gates the raw-key math itself).
    // ---- bucket01: bucketed co-located join — THE shuffle eliminator
    // for the repeated fact-to-fact join at 100 TB: write both sides
    // bucketed on the join key (8 buckets here; thousands on a real
    // lake), and every later join on that key reads bucket i of each
    // side into the same task — NO Exchange on either side, proven by
    // PlanSpec (the plan shape is the artifact; this query gates the
    // RESULT). One-time layout cost, every downstream join rides free;
    // the same mechanism backs the skew01/shard01 story at the storage
    // layer instead of at query time.
    "bucket01_colocated_join" -> ((spark: SparkSession, dir: String) => {
      import graft.ops.Layout
      val (liTable, oTable) = Layout.bucketedPair(spark, dir)
      val li = spark.table(liTable)
      // merge hint: at test SF the orders side fits the broadcast
      // threshold, which would bypass the co-location being proven; at
      // the 100 TB design point both sides are fact-sized and SMJ is
      // what the planner picks anyway — the hint just pins that plan.
      val o = spark.table(oTable).hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          d(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    "zorder02_skip_stats" -> ((spark: SparkSession, dir: String) => {
      val zt = t(spark, dir, "orders").select(
          col("o_custkey").cast("bigint").as("x"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("bigint").as("y"))
      val bounds = zt.agg(
        min(col("x")).as("xmin"), max(col("x")).as("xmax"),
        min(col("y")).as("ymin"), max(col("y")).as("ymax"))
      // zfile = top-4-bits z-block (z div 4096 on the fixed 16-bit
      // grid): block-ALIGNED, so every file is one (x-quarter,
      // y-quarter) rectangle; a zmax-relative split would straddle
      // block boundaries and widen every box.
      val keyed = zt.crossJoin(broadcast(bounds))
        .withColumn("xs", expr("((x - xmin) * 256) div (xmax - xmin + 1)"))
        .withColumn("ys", expr("((y - ymin) * 256) div (ymax - ymin + 1)"))
        .withColumn("z", expr(Layout.zkeySql("xs", "ys", bits = 8)))
        .withColumn("zfile", expr(s"z div ${65536 / nFiles}"))
        .withColumn("dfile", expr(s"((y - ymin) * $nFiles) div (ymax - ymin + 1)"))
        .withColumn("pxlo", expr("xmin + (5 * (xmax - xmin)) div 16"))
        .withColumn("pxhi", expr("xmin + (11 * (xmax - xmin)) div 32"))
        .withColumn("pylo", expr("ymin + (ymax - ymin) div 4"))
        .withColumn("pyhi", expr("ymin + (3 * (ymax - ymin)) div 4"))
      def stats(fileCol: String, label: String) = keyed
        .groupBy(col(fileCol).as("file_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("lo_x"), max(col("x")).as("hi_x"),
          min(col("y")).as("lo_y"), max(col("y")).as("hi_y"),
          max(col("pxlo")).as("pxlo"), max(col("pxhi")).as("pxhi"),
          max(col("pylo")).as("pylo"), max(col("pyhi")).as("pyhi"))
        .withColumn("skipped",
          (col("hi_x") < col("pxlo") || col("lo_x") > col("pxhi") ||
            col("hi_y") < col("pylo") || col("lo_y") > col("pyhi")).cast("int"))
        .groupBy()
        .agg(count(lit(1)).as("n_files"),
          sum(col("skipped")).cast("bigint").as("n_skipped"),
          sum(when(col("skipped") === 0, col("n_rows")).otherwise(0L))
            .as("rows_scanned"))
        .select(lit(label).as("layout"), col("n_files"), col("n_skipped"),
          col("rows_scanned"))
      stats("zfile", "zorder").unionAll(stats("dfile", "day_sorted"))
        .orderBy("layout")
    }),
  )

  private val skipCase =
    "CASE WHEN hi_x < pxlo OR lo_x > pxhi OR hi_y < pylo OR lo_y > pyhi THEN 1 ELSE 0 END"

  val oracles: Map[String, String] = Map(
    "bucket01_colocated_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "zorder02_skip_stats" ->
      s"""WITH zt AS (
         |  SELECT CAST(o_custkey AS BIGINT) AS x,
         |    CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS y
         |  FROM orders),
         |b AS (SELECT MIN(x) AS xmin, MAX(x) AS xmax,
         |    MIN(y) AS ymin, MAX(y) AS ymax,
         |    MIN(x) + (5 * (MAX(x) - MIN(x))) // 16 AS pxlo,
         |    MIN(x) + (11 * (MAX(x) - MIN(x))) // 32 AS pxhi,
         |    MIN(y) + (MAX(y) - MIN(y)) // 4 AS pylo,
         |    MIN(y) + (3 * (MAX(y) - MIN(y))) // 4 AS pyhi
         |  FROM zt),
         |zk AS (
         |  SELECT x, y, pxlo, pxhi, pylo, pyhi, ymin, ymax,
         |    ${Layout.zkeySql("((x - xmin) * 256) // (xmax - xmin + 1)", "((y - ymin) * 256) // (ymax - ymin + 1)", 8)} AS z
         |  FROM zt, b),
         |keyed AS (
         |  SELECT x, y, z // ${65536 / nFiles} AS zfile,
         |    ((y - ymin) * $nFiles) // (ymax - ymin + 1) AS dfile,
         |    pxlo, pxhi, pylo, pyhi
         |  FROM zk),
         |zb AS (
         |  SELECT zfile AS file_id, COUNT(*) AS n_rows,
         |    MIN(x) AS lo_x, MAX(x) AS hi_x, MIN(y) AS lo_y, MAX(y) AS hi_y,
         |    MAX(pxlo) AS pxlo, MAX(pxhi) AS pxhi, MAX(pylo) AS pylo, MAX(pyhi) AS pyhi
         |  FROM keyed GROUP BY 1),
         |db AS (
         |  SELECT dfile AS file_id, COUNT(*) AS n_rows,
         |    MIN(x) AS lo_x, MAX(x) AS hi_x, MIN(y) AS lo_y, MAX(y) AS hi_y,
         |    MAX(pxlo) AS pxlo, MAX(pxhi) AS pxhi, MAX(pylo) AS pylo, MAX(pyhi) AS pyhi
         |  FROM keyed GROUP BY 1),
         |zs AS (
         |  SELECT 'zorder' AS layout, COUNT(*) AS n_files,
         |    CAST(SUM($skipCase) AS BIGINT) AS n_skipped,
         |    CAST(SUM(CASE WHEN $skipCase = 0 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
         |  FROM zb),
         |ds AS (
         |  SELECT 'day_sorted' AS layout, COUNT(*) AS n_files,
         |    CAST(SUM($skipCase) AS BIGINT) AS n_skipped,
         |    CAST(SUM(CASE WHEN $skipCase = 0 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
         |  FROM db)
         |SELECT * FROM zs UNION ALL SELECT * FROM ds ORDER BY layout""".stripMargin,

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
