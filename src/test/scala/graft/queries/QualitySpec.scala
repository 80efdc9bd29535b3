package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** dq02's detection contract: the referential audit must actually FLAG
  * orphans, not just report zeros on clean data (the real testdata has
  * none, so the gate alone cannot prove detection). A synthetic star
  * schema with one broken FK per class exercises the positive path. */
class QualitySpec extends SparkSpec {

  test("dq02 flags injected orphans and null FKs do not count as orphans") {
    import spark.implicits._
    val dir = Files.createTempDirectory("dq02_fixture").toString
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    write("region", Seq((0, "r0")).toDF("r_regionkey", "r_name"))
    write("nation", Seq((0, "n0", 0), (1, "n1", 9)) // regionkey 9 -> orphan
      .toDF("n_nationkey", "n_name", "n_regionkey"))
    write("customer", Seq((10L, "c", 0, 1.0, "SEG"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    write("supplier", Seq((20L, "s", 0, 1.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    write("part", Seq((30L, "p", "B", "T", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"))
    // one good order, one order pointing at a missing customer, one with
    // a NULL custkey (incomplete, but NOT an orphan — dq01's territory)
    write("orders", Seq(
        (100L, Some(10L), "O", 5.0, "1995-01-01", "P1"),
        (101L, Some(99L), "O", 5.0, "1995-01-01", "P1"),
        (102L, None: Option[Long], "O", 5.0, "1995-01-01", "P1"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp")))
    write("lineitem", Seq(
        (100L, 30L, 20L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-02"),
        (999L, 30L, 20L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-02"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp")))

    val rows = SparkEntry.queries("dq02_referential_integrity")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("lineitem_orderkey") === ((2L, 1L))) // l_orderkey=999 orphan
    assert(rows("orders_custkey") === ((2L, 1L)))    // custkey 99 orphan; NULL excluded
    assert(rows("nation_regionkey") === ((2L, 1L)))  // regionkey 9 orphan
    assert(rows("lineitem_partkey") === ((2L, 0L)))
    assert(rows("supplier_nationkey") === ((1L, 0L)))
  }
}
