package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of the CDC merge operators and determinism of the k-means
  * clustering under adversarial partitioning. */
class MergeSpec extends SparkSpec {

  test("merge: latestWins keeps exactly the max-version row per key") {
    import spark.implicits._
    val stream = Seq(
      (1L, 1, "a"), (1L, 3, "c"), (1L, 2, "b"), // key 1: version 3 wins
      (2L, 5, "x"), //                             key 2: single row
      (3L, 7, "p"), (3L, 7, "q") //                key 3: version tie -> tieBreak
    ).toDF("k", "version", "payload")
    val out = Merge.latestWins(stream, Seq("k"), "version", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out == Map(1L -> ((3, "c")), 2L -> ((5, "x")), 3L -> ((7, "q"))))
  }

  test("merge: scd2Intervals chains versions and flags the open interval") {
    import spark.implicits._
    val stream = Seq(
      (1L, 10, 100), (1L, 20, 200), (1L, 30, 300),
      (2L, 5, 50)
    ).toDF("k", "version", "payload")
    val rows = Merge.scd2Intervals(stream, Seq("k"), "version", "payload")
      .select(col("k"), col("valid_from"), col("valid_to"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getBoolean(3))).toSet
    assert(rows == Set(
      (1L, 10, 20, false), (1L, 20, 30, false), (1L, 30, -1, true),
      (2L, 5, -1, true)))
  }

  test("clustering: k-means labels are identical under repartitioning") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = Clustering.kmeansAssignments(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clustering.kmeansAssignments(emb.repartition(13, col("label")),
        "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "integer-quantized centroid sums must be partition-order-independent")
    assert(a.values.toSet.size > 1, "clustering must actually separate the data")
  }
}
