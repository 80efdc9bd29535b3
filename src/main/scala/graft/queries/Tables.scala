package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders + cross-engine determinism helpers.
  *
  * The driver's correctness gate hash-compares Spark results against a
  * DuckDB oracle, so every query result must be bit-deterministic across
  * engines:
  *   - money/quantity columns are exactly 2-decimal doubles in the data, so
  *     they are cast to DECIMAL(18,2) before SUM (exact arithmetic in both
  *     engines), and the exact sum is cast back to DOUBLE at the end
  *     (correctly-rounded, identical in both engines);
  *   - averages/ratios are computed as DOUBLE division of exact operands
  *     (IEEE 754, identical everywhere) — never decimal division, whose
  *     result scale is engine-specific;
  *   - timestamps are emitted as formatted strings;
  *   - every query ends with a total ORDER BY (unique tie-break column);
  *   - a decimal whose value needs > 53 mantissa bits (sums of SQUARES
  *     reach 1e16 fast) must cross to double via a correctly-rounded
  *     path in BOTH engines: Spark's decimal cast (BigDecimal
  *     .doubleValue) is correctly rounded, DuckDB's direct cast is not
  *     always — route the DuckDB side through CAST(... AS VARCHAR) AS
  *     DOUBLE (see n06's oracle).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two physical layouts across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects — its
    * timestamp type is microseconds) and plain TIMESTAMP(MICROS). Adapt to
    * whichever is on disk: nanos are read as raw longs and floor-divided to
    * micros — exactly DuckDB's ns->us truncation — while a native
    * micros column is cast to the session-zone timestamp type (UTC session,
    * so the cast is value-preserving and downstream date math matches the
    * DuckDB oracle's naive-timestamp reading bit-for-bit). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Registers all tables as temp views (the SQL entry surface). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Lossless exact cast for the 2-decimal money/qty/rate columns. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact decimal -> double, the final form of every summed measure. */
  def d(c: Column): Column = c.cast("double")

  /** Timestamp -> 'yyyy-MM-dd' string (DuckDB mirror: strftime(ts, '%Y-%m-%d')). */
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
