package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-compression scale path for
  * ANN: split each d-dim vector into m contiguous subspaces, train a
  * tiny k-centroid codebook per subspace (deterministic Lloyd — see
  * graft.ops.Clustering for the integer-quantized determinism design),
  * and store each vector as m small codes. At 100 TB this is the point:
  * a 64-dim float vector (256 B) becomes m codes (m bytes at k <= 256),
  * so the candidate scan reads codes, not vectors.
  *
  * Query-time ADC (asymmetric distance computation): the query keeps
  * full precision; its distance to every (subspace, centroid) pair
  * forms an m x k distance table — BROADCAST-sized regardless of corpus
  * size. Approximate distance of a stored vector = sum of its m table
  * lookups: a keyed join of the skinny code relation against the table
  * plus one id-keyed aggregation — the corpus vectors themselves are
  * never read at query time.
  *
  * Determinism: codebooks inherit Clustering's exact-integer design;
  * the per-(subspace, centroid) distances are in-order double folds
  * FLOORED to int64, so the per-vector sum of m partial distances is
  * exact integer arithmetic — order-independent and engine-identical
  * (the pr01 quantize-then-integer-sum idiom; flooring costs rank
  * fidelity only at sub-unit distance differences, far below the 1e12
  * scale of quantized squared distances). */
object Pq {

  /** Train the codebook and encode every vector.
    * Returns (codes: (id, sub, code), codebook: (sub, cid, m)). */
  def model(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, iters: Int): (DataFrame, DataFrame) = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    val parts = (0 until m).map { s =>
      val sub = df.select(col(idCol),
        slice(col(vecCol), s * dsub + 1, dsub).as("subv"))
      val (asg, means) = Clustering.kmeansModel(sub, idCol, "subv", k, iters)
      (asg.select(col(idCol), lit(s).as("sub"), col("cluster").as("code")),
        means.select(lit(s).as("sub"), col("cid"), col("m")))
    }
    (parts.map(_._1).reduce(_ unionAll _), parts.map(_._2).reduce(_ unionAll _))
  }

  /** The in-order squared-distance fold between a quantized int vector
    * and a double centroid — textually identical to Clustering.assign's
    * distance so the two can't drift. */
  private def sqDist(qq: Column, mm: Column): Column =
    aggregate(zip_with(qq, mm, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0d), (acc, x) => acc + x)

  /** ADC top-k for ONE query row (`query` must have exactly one row with
    * idCol/vecCol): build the m x k floored distance table, join it onto
    * the code relation, and sum per vector. The query vector itself is
    * excluded by id. */
  def adcTopK(codes: DataFrame, codebook: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, dims: Int, m: Int, topK: Int): DataFrame = {
    val dsub = dims / m
    val qSubs = (0 until m).map { s =>
      query.select(lit(s).as("sub"),
        expr(s"transform(slice($vecCol, ${s * dsub + 1}, $dsub), " +
          "x -> floor(cast(x as double) * 1000000.0))").as("qq"),
        col(idCol).as("__qid"))
    }.reduce(_ unionAll _)
    val dtable = qSubs.join(codebook, "sub")
      .select(col("sub"), col("cid").as("code"), col("__qid"),
        floor(sqDist(col("qq"), col("m"))).cast("long").as("d"))
    val approx = codes.join(broadcast(dtable), Seq("sub", "code"))
      .filter(col(idCol) =!= col("__qid"))
      .groupBy(idCol)
      .agg(sum("d").as("approx_dist"))
      .orderBy(col("approx_dist").asc, col(idCol).asc)
      .limit(topK)
    // rank over the topK-row result only (the samp03 pattern)
    approx.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("approx_dist").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("approx_dist"))
  }

  /** ADC shortlist + exact rerank — the production PQ query shape: the
    * coarse integer ADC pass prunes the corpus to `shortlistK` ids
    * (reading only codes), then ONLY those vectors are fetched and
    * re-scored with the exact (quantized) distance. The shortlist is
    * broadcast back onto the vector relation, so the rerank touches
    * shortlistK rows no matter the corpus size. */
  def adcRerankTopK(df: DataFrame, codes: DataFrame, codebook: DataFrame,
      query: DataFrame, idCol: String, vecCol: String, dims: Int, m: Int,
      shortlistK: Int, topK: Int): DataFrame = {
    val sl = adcTopK(codes, codebook, query, idCol, vecCol, dims, m, shortlistK)
      .select(col(idCol), col("approx_dist"))
    val qRow = Clustering.quantize(query, idCol, vecCol)
      .select(expr("transform(q, x -> cast(x as double))").as("qm"))
    Clustering.quantize(df, idCol, vecCol)
      .join(broadcast(sl), Seq(idCol))
      .crossJoin(broadcast(qRow))
      .select(col(idCol), col("approx_dist"),
        floor(sqDist(col("q"), col("qm"))).cast("long").as("exact_dist"))
      .orderBy(col("exact_dist").asc, col(idCol).asc)
      .limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("exact_dist").asc, col(idCol).asc)))
      .select(col("rank"), col(idCol), col("exact_dist"), col("approx_dist"))
  }
}
