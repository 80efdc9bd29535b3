package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.SparkSpec
import graft.queries.Tables

/** Scale-technique contracts: salted joins preserve results, bucketed
  * tables join without a shuffle, and the SQL view surface works. */
class ScaleSpec extends SparkSpec {

  test("salted join == plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = spark.range(100000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k2", "v")
    val plain = big.join(small, col("k") === col("k2"))
    val salted = Skew.saltedJoin(big, small, "k", "k2", saltSource = col("payload"), k = 8)
    assert(salted.count() == plain.count())
    val plainAgg = plain.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val saltedAgg = salted.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(saltedAgg == plainAgg)
  }

  test("skew profile surfaces the hot key") {
    val big = spark.range(10000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id")).as("k"))
    val top = Skew.keySkewProfile(big, "k", 1).collect().head
    assert(top.getLong(0) == 1L && top.getDouble(2) > 0.8)
  }

  test("er01 stop-trigram DF cap bounds per-key join fan-out") {
    // Rebuild er01's clean-side trigram relation and assert the cap's
    // contract: at least one corpus-ubiquitous trigram is pruned, and
    // every SURVIVING join key has fan-out <= 0.15 x |registry| — the
    // bound that keeps the inverted-index join from going quadratic on
    // a hot key at corpus scale.
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), expr("array_join(slice(split(text, ' '), 1, 3), ' ')").as("name"))
    val nClean = base.count()
    val cap = 0.15 * nClean
    val df = base.select(col("doc_id"),
        explode(expr(graft.ops.Dedup.shinglesExpr("name", 3))).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("df"))
    val pruned = df.filter(col("df").cast("double") > cap).count()
    assert(pruned > 0, "fixture must exercise the stop-trigram path")
    val survivingMax = df.filter(col("df").cast("double") <= cap)
      .agg(max(col("df"))).head.getLong(0)
    assert(survivingMax <= cap)
    // And the capped query still resolves entities (result non-degenerate).
    val out = graft.queries.DedupQueries.defs("er01_fuzzy_entity_match")(spark, sf0001)
    assert(out.count() > 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(!wh.contains("/root/repo"), s"warehouse must not pollute the repo: $wh")
    // a fresh in-memory catalog doesn't know about last run's managed-table
    // locations -> LOCATION_ALREADY_EXISTS; clear both catalog and disk
    Seq("li_bucketed", "ord_bucketed").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(wh.stripPrefix("file:"), tbl)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Tables.t(spark, sf0001, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.t(spark, sf0001, "orders")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.sql(
      """SELECT /*+ MERGE(li_bucketed) */ count(*) AS n
        |FROM li_bucketed JOIN ord_bucketed ON l_orderkey = o_orderkey""".stripMargin)
    val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.collect().head.getLong(0) ==
      Tables.t(spark, sf0001, "lineitem").count())
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    import spark.implicits._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force SMJ (no broadcast) and make the skew detector fire on
      // test-sized data — the mechanism under test is the runtime
      // re-plan itself, which is what saves the 100 TB hot-key join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 95% of the fact rows share one key; dim side is uniform
      val fact = spark.range(200000)
        .select(when(col("id") % 20 < 19, 7L).otherwise(col("id") % 1000).as("k"),
          concat(lit("payload-"), col("id")).as("pay"))
      val dim = spark.range(1000).select(col("id").as("k2"), concat(lit("d"), col("id")).as("v"))
      val joined = fact.join(dim, col("k") === col("k2"))
      // execute THIS dataframe's own QueryExecution — count()/foreach()
      // plan separate queries (agg / rdd-deserialize) and would leave
      // this AdaptiveSparkPlan un-finalized
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition skew=true:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    // The third runtime scale mechanism next to AQE coalesce/skew: when
    // one join side carries a selective filter, Catalyst injects a bloom
    // filter built from it into the OTHER side's scan, so the big side
    // drops non-joining rows before the shuffle (Spark's
    // InjectRuntimeFilter). At 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~matching slice.
    // Production thresholds (10 GB application side) can't trigger on
    // test data, so the size gates are lowered — the mechanism under
    // test is the rewrite itself.
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // no broadcast: a broadcast-hash join already prunes via its own
      // runtime mechanisms; the bloom path targets shuffle joins
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"expected an injected bloom filter on the lineitem side:\n${optimized.take(2000)}")
      // and the rewrite must not change the answer
      val expected = li.join(
        spark.read.parquet(s"$sf0001/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
      assert(joined.count() == expected && expected > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("SQL surface: registered views answer spark.sql directly") {
    Tables.registerViews(spark, sf0001)
    val df = spark.sql(
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus <> 'P' GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(df.count() > 0)
  }
}
