package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Pq

/** Pins the QUALITY of the corpus-scaled PQ knobs, not just their
  * determinism (sim06's oracle gates that): at sf0.1 — the scale where
  * round 7 measured the fixed 16-centroid / 100-shortlist knobs
  * degrading to recall@10 = 0.6 — the scaled codebook and rerank budget
  * must hold mean recall@10 >= 0.8 against the exact quantized-distance
  * top-10 over a panel of queries. */
class PqRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  private def exactTop10(emb: DataFrame, q: Long): Set[Long] = {
    val qRow = emb.filter(col("vec_id") === q).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= q).crossJoin(broadcast(qRow))
      .select(col("vec_id"),
        expr("""aggregate(zip_with(embedding, qe,
          |  (a, b) -> (floor(cast(a as double) * 1000000.0) - floor(cast(b as double) * 1000000.0))
          |          * (floor(cast(a as double) * 1000000.0) - floor(cast(b as double) * 1000000.0))),
          |  0D, (acc, x) -> acc + x)""".stripMargin).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
  }

  test("pq: corpus-scaled knobs hold mean recall@10 >= 0.8 at sf0.1") {
    val emb = Tables.t(spark, dir, "embeddings").cache()
    val n = emb.count()
    val (k, sl) = (SimilarityQueries.pqK(n), SimilarityQueries.pqShortlist(n))
    assert(k > 16 && sl > 100,
      s"sf0.1 (n=$n) must scale past the driver-SF floor, got k=$k shortlist=$sl")
    val (codes, codebook) = Pq.model(emb, "vec_id", "embedding",
      dims = 64, m = 8, k = k, iters = 2)
    codes.cache().count(): Unit
    codebook.cache().count(): Unit
    val recalls = (0L until 8L).map { q =>
      val approx = Pq.adcRerankTopK(emb, codes, codebook,
          emb.filter(col("vec_id") === q), "vec_id", "embedding",
          dims = 64, m = 8, shortlistK = sl, topK = 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (approx intersect exactTop10(emb, q)).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@10 = $mean (per-query: $recalls)")
  }

  test("ivfadc (knn05): coarse pruning stacked on PQ still holds " +
      "recall@10 >= 0.5 at sf0.1 for the gated query") {
    val emb = Tables.t(spark, dir, "embeddings").cache()
    val approx = graft.SparkEntry.queries("knn05_ivf_pq")(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (approx intersect exactTop10(emb, 0L)).size / 10.0
    // two stacked approximations (nProbes=2 list pruning x ADC codes):
    // the compound floor is necessarily below either alone — measured
    // 1.0 on this corpus; pinned with margin for corpus regeneration
    assert(recall >= 0.5, s"IVFADC recall@10 = $recall")
    info(s"IVFADC recall@10 = $recall")
  }
}
