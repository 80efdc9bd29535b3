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
    * Returns (codes: (id, sub, code), codebook: (sub, cid, m)).
    *
    * All m subspaces train TOGETHER in one (id, sub, subvector)
    * relation: each Lloyd iteration is one broadcast join keyed by sub
    * (the m x k centroid relation) plus one (sub, cid, dim)-keyed
    * aggregation — m-fold fewer jobs than looping per-subspace, and the
    * corpus is scanned exactly once (the checkpoint below). Numerically
    * identical to independent per-subspace training: every (sub) group
    * sees the same seeds, distances, and tie-breaks. */
  /** The (id, sub, quantized-subvector) relation every PQ pass starts
    * from — one corpus scan, m rows per vector. */
  private def quantizedSubs(df: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int): DataFrame = {
    require(dims % m == 0, s"dims=$dims not divisible by m=$m subspaces")
    val dsub = dims / m
    df.select(col(idCol), posexplode(array((0 until m).map(s =>
        expr(s"transform(slice($vecCol, ${s * dsub + 1}, $dsub), " +
          "x -> floor(cast(x as double) * 1000000.0))")): _*))
      .as(Seq("sub", "q")))
  }

  /** Nearest-codeword assignment of a quantized (id, sub, q) relation
    * against a `(sub, cid, m)` codebook — the ONE rule shared by
    * training, the incremental encode of new vectors against a
    * PERSISTED codebook, and the oracle, so the three can never
    * drift. Broadcast-sized: m x k codewords. */
  private def assignAgainst(q: DataFrame, codebook: DataFrame, idCol: String): DataFrame = {
    val cents = codebook.groupBy("sub")
      .agg(collect_list(struct(col("cid"), col("m"))).as("cs"))
    q.join(broadcast(cents), "sub")
      .select(col(idCol), col("sub"), col("q"),
        expr( // Clustering.assign's argmin, per subspace group
          """array_min(transform(cs, c -> struct(
            |  aggregate(zip_with(q, c.m, (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
            |            0D, (acc, x) -> acc + x) as d,
            |  c.cid as cid))).cid""".stripMargin).as("code"))
  }

  /** Encode vectors against an EXISTING codebook (e.g. one read back
    * from a lake table): (id, sub, code) — the incremental-maintenance
    * path of a persisted PQ index, where new arrivals are coded by the
    * codebook trained at build time, never a retrain. */
  def encode(df: DataFrame, codebook: DataFrame, idCol: String, vecCol: String,
      dims: Int, m: Int): DataFrame =
    assignAgainst(quantizedSubs(df, idCol, vecCol, dims, m), codebook, idCol)
      .select(col(idCol), col("sub"), col("code"))

  def model(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, iters: Int): (DataFrame, DataFrame) =
      Jobs.labeled(df.sparkSession, "pq model") {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val q = quantizedSubs(df, idCol, vecCol, dims, m)
      .localCheckpoint(true) // the one corpus scan ends here
    // seeds = the k LOWEST ids BY RANK (not the value test `id < k`,
    // the round-16 seeding rule shared with AnnIndex/refinedIvfCentroids:
    // a sparse or offset id space must still train a full codebook);
    // distributed top-k, never a global-sort window
    val init = q.join(
        broadcast(q.select(col(idCol)).distinct()
          .orderBy(col(idCol).asc).limit(k)),
        Seq(idCol), "left_semi")
      .select(col("sub"), col(idCol).as("cid"),
        expr("transform(q, x -> cast(x as double))").as("m"))
    def assignAll(means: DataFrame): DataFrame = assignAgainst(q, means, idCol)
    def recompute(assigned: DataFrame): DataFrame =
      assigned
        .select(col("sub"), col("code").as("cid"), posexplode(col("q")).as(Seq("dim", "val")))
        .groupBy("sub", "cid", "dim").agg(sum("val").as("s"), count(lit(1)).as("cnt"))
        .groupBy("sub", "cid")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("s"), col("cnt")))),
          p => p.getField("s").cast("double") / p.getField("cnt").cast("double")).as("m"))
    val finalMeans = (1 until iters).foldLeft(init) { (means, _) =>
      recompute(assignAll(means)).localCheckpoint(true)
    }
    // fail LOUDLY on sub-space collapse: vectors shorter than `dims`
    // slice to EMPTY tails, whose recomputed means vanish from the
    // codebook — every later encode would silently drop those subs and
    // corrupt ADC distances (the round-16 degenerate-build rule)
    val nSubs = finalMeans.select("sub").distinct().count()
    require(nSubs == m,
      s"PQ training produced codebooks for $nSubs of $m sub-spaces — " +
        s"are the vectors at least $dims dims?")
    (assignAll(finalMeans).select(col(idCol), col("sub"), col("code")),
      finalMeans.select(col("sub"), col("cid"), col("m")))
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
