package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries guarantees, checked against exact counts — the sketch's
  * estimates are encounter-order-dependent (so no hash oracle, like
  * HLL/appx01), but its BOUNDS are deterministic facts:
  *   (1) every item with true frequency > n/k is present;
  *   (2) estimates never overcount and undercount by at most n/k;
  *   (3) both hold under any partitioning (mergeable summaries).
  */
class HeavyHittersSpec extends SparkSpec {

  private val K = 10

  private def wordStream(parts: Int) = {
    graft.functions.VectorFunctions.registerAll(spark)
    graft.queries.Tables.t(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .repartition(parts)
  }

  private def exactCounts(): Map[String, Long] =
    wordStream(4).groupBy("word").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def sketch(parts: Int): Seq[(String, Long)] =
    wordStream(parts)
      .agg(expr(s"heavy_hitters(word, $K)").as("hh"))
      .collect().head.getSeq[Row](0)
      .map(r => (r.getString(0), r.getLong(1)))

  test("items above n/k are always present; estimates undercount by at most n/k") {
    val exact = exactCounts()
    val n = exact.values.sum
    for (parts <- Seq(1, 7)) {
      val hh = sketch(parts).toMap
      assert(hh.size <= K - 1, s"sketch must hold at most k-1 counters, got ${hh.size}")
      val mustHave = exact.filter(_._2 > n / K).keySet
      assert(mustHave.subsetOf(hh.keySet),
        s"parts=$parts: items above n/k missing: ${mustHave -- hh.keySet}")
      hh.foreach { case (w, est) =>
        val truth = exact(w)
        assert(est <= truth, s"parts=$parts: $w overcounted ($est > $truth)")
        assert(truth - est <= n / K, s"parts=$parts: $w undercounted past n/k")
      }
    }
  }

  test("output is sorted (count desc, item asc) and the SQL surface works") {
    wordStream(3).createOrReplaceTempView("hh_words")
    val rows = spark.sql(s"SELECT heavy_hitters(word, $K) AS hh FROM hh_words")
      .collect().head.getSeq[Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows == rows.sortBy { case (w, c) => (-c, w) })
  }

  test("decrement path keeps memory bounded: high-cardinality stream, k-1 counters") {
    import spark.implicits._
    graft.functions.VectorFunctions.registerAll(spark)
    // 10k distinct singletons + one hot key repeated 2k times
    val df = ((1 to 10000).map(i => s"u$i") ++ Seq.fill(2000)("hot")).toDF("word")
      .repartition(5)
    val hh = df.agg(expr("heavy_hitters(word, 5)").as("hh"))
      .collect().head.getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(hh.size <= 4)
    assert(hh.headOption.exists(_._1 == "hot"),
      s"the single heavy item must survive the sketch, got $hh")
  }
}
