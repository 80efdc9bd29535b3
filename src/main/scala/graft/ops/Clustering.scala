package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over embedding columns — the clustering
  * stage of a corpus pipeline (topic bucketing, cluster-balanced
  * sampling, IVF centroid training for the sim02/sim04 indexes).
  *
  * Floating-point k-means is notoriously run-dependent: float summation
  * order changes the centroids, which changes assignments. This
  * implementation is bit-deterministic across runs, partitionings, AND
  * engines:
  *  - embeddings are quantized once to integers (floor(x * 1e6), exact
  *    in int64), so centroid numerators are INTEGER sums — associative,
  *    order-independent, and overflow-safe up to ~9e12 members/cluster;
  *  - centroid means are IEEE double divisions of those exact integers;
  *  - distances are strict in-order folds in doubles (same result on any
  *    engine), with argmin ties broken by centroid id.
  *
  * Scale shapes (100 TB):
  *  - assignment is ZERO-shuffle: the k centroids collapse to a 1-row
  *    array relation, broadcast, and the argmin runs inside the scan as
  *    array_min over per-centroid (dist, cid) structs — the corpus never
  *    moves;
  *  - the centroid update is one map-side-combinable shuffle keyed by
  *    (cluster, dim) — k*d groups (512 for k=8, d=64) regardless of
  *    corpus size;
  *  - per-iteration means are localCheckpoint'd (k rows) so lineage stays
  *    bounded across iterations, as in Graph.connectedComponents.
  */
object Clustering {

  /** (id, q) with q = floor(x * 1e6) per element: int64-exact, so later
    * sums are order-independent. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      expr(s"transform($vecCol, x -> floor(cast(x as double) * 1000000.0))").as("q"))

  /** Assign each row to the nearest centroid — zero shuffle: `means`
    * (cid, m: array<double>) is folded into one broadcast row and the
    * argmin is a scan-local array_min over (dist, cid) structs (struct
    * ordering = dist asc, then cid asc — the deterministic tie-break). */
  def assign(quantized: DataFrame, means: DataFrame, idCol: String): DataFrame = {
    val centsRow = means.agg(collect_list(struct(col("cid"), col("m"))).as("cs"))
    quantized.join(broadcast(centsRow))
      .select(col(idCol), col("q"),
        expr(
          """array_min(transform(cs, c -> struct(
            |  aggregate(zip_with(q, c.m, (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
            |            0D, (acc, x) -> acc + x) as d,
            |  c.cid as cid))).cid""".stripMargin).as("cluster"))
  }

  /** Recompute centroid means from an assignment: integer per-dim sums
    * (order-independent), then one double division each. */
  def recomputeMeans(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster").as("cid"), posexplode(col("q")).as(Seq("dim", "val")))
      .groupBy("cid", "dim").agg(sum("val").as("s"), count(lit(1)).as("cnt"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("s"), col("cnt")))),
        p => p.getField("s").cast("double") / p.getField("cnt").cast("double")).as("m"))

  /** Full Lloyd loop: centroids seeded from the k smallest ids, `iters`
    * assign+update rounds. Returns BOTH the final (id, cluster) labeling
    * and the trained (cid, m) centroids — index builds (PQ codebooks,
    * IVF lists) need the centroids, not just the labels. */
  def kmeansModel(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2): (DataFrame, DataFrame) = {
    val q = quantize(df, idCol, vecCol)
    val init = q.filter(col(idCol) < k)
      .select(col(idCol).as("cid"),
        expr("transform(q, x -> cast(x as double))").as("m"))
    val finalMeans = (1 until iters).foldLeft(init) { (means, _) =>
      recomputeMeans(assign(q, means, idCol)).localCheckpoint(true)
    }
    (assign(q, finalMeans, idCol).select(col(idCol), col("cluster")), finalMeans)
  }

  /** Final (id, cluster) labeling only — the km01/km02/km03 surface. */
  def kmeansAssignments(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2): DataFrame =
    kmeansModel(df, idCol, vecCol, k, iters)._1
}
