package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts of the bounded top-k aggregate: agreement with the
  * row_number window form under any partitioning (exercises partial
  * aggregation, serialize/merge), tie determinism, null/NaN skipping,
  * k larger than the group, and the plan shape (ObjectHashAggregate
  * with a partial phase — no sort of the input). */
class TopKAggSpec extends SparkSpec {

  private def refTopK(rows: Seq[(String, Double, Long)], k: Int): Map[String, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy { case (_, key, id) => (-key, id) }.take(k).map(_._3)
    }

  test("topk_pairs equals the sort-take reference under 1, 3, and 16 partitions") {
    import spark.implicits._
    VectorFunctions.registerAll(spark)
    val rnd = new scala.util.Random(42)
    val groups = Seq("a", "b", "c", "d")
    // duplicate keys on purpose: ties must break by smallest id
    val rows = (0L until 2000L).map { id =>
      (groups(rnd.nextInt(groups.length)), (rnd.nextInt(50) / 7.0), id)
    }
    val expected = refTopK(rows, 5)
    for (nPart <- Seq(1, 3, 16)) {
      val got = rows.toDF("g", "key", "id").repartition(nPart)
        .groupBy("g").agg(expr("topk_pairs(key, id, 5)").as("top"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSeq)
        .toMap
      assert(got == expected, s"nPart=$nPart")
    }
  }

  test("k exceeding the group returns the whole group ordered; null/NaN keys skipped") {
    import spark.implicits._
    VectorFunctions.registerAll(spark)
    val df = Seq(
      ("g", Some(1.0), 10L), ("g", Some(3.0), 11L), ("g", None, 12L),
      ("g", Some(Double.NaN), 13L), ("g", Some(3.0), 9L))
      .toDF("g", "key", "id")
    val out = df.groupBy("g").agg(expr("topk_pairs(key, id, 100)").as("top"))
      .select(explode(col("top")).as("p")).select("p.key", "p.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((3.0, 9L), (3.0, 11L), (1.0, 10L)))
  }

  test("plans as a two-phase ObjectHashAggregate — no sort, no window") {
    import spark.implicits._
    VectorFunctions.registerAll(spark)
    val df = (0L until 100L).map(i => (s"g${i % 3}", i / 3.0, i)).toDF("g", "key", "id")
      .repartition(4)
      .groupBy("g").agg(expr("topk_pairs(key, id, 3)").as("top"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_topk_pairs"), plan)
    assert(!plan.contains("WindowExec") && !plan.toLowerCase.contains("sortexec"), plan)
  }
}
