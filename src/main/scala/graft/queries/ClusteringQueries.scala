package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Embedding-clustering queries over the `embeddings` table — see
  * graft.ops.Clustering for the determinism and scale design. The
  * reference engine has no clustering surface (its data plane stops at
  * parse->enrich->store, ingestion_service.rs:45-127); this is part of
  * the beyond-reference training-data-pipeline layer. */
object ClusteringQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- km01: deterministic Lloyd k-means (k=8, 2 rounds, centroids
    // seeded from vec_id < 8). Integer-quantized sums make the centroids
    // order-independent, so the full iterative algorithm hash-matches an
    // engine-independent oracle — rare for k-means. Output is the final
    // per-vector cluster labeling.
    "km01_kmeans" -> ((spark: SparkSession, dir: String) => {
      graft.ops.Clustering.kmeansAssignments(
          t(spark, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
        .orderBy("vec_id")
    }),

    // ---- km02: cluster profile — sizes and exact label mix per final
    // cluster (the report a curation run uses to pick per-cluster
    // sampling rates). avg of exact ints = deterministic double.
    "km02_cluster_profile" -> ((spark: SparkSession, dir: String) => {
      val emb = t(spark, dir, "embeddings")
      graft.ops.Clustering.kmeansAssignments(emb, "vec_id", "embedding", k = 8, iters = 2)
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
        .groupBy("cluster")
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("label")).as("n_labels"),
          avg(col("label")).as("avg_label"))
        .orderBy("cluster")
    }),

    // ---- km03: cluster-balanced sampling — at most 30 vectors per final
    // k-means cluster, picked in deterministic pseudo-random order
    // (md5(vec_id) — the same seeded-hash idiom as split01/samp01, so the
    // pick is engine- and partitioning-independent). This is how a
    // curation run equalizes topic coverage: over-represented clusters
    // are downsampled to the cap, rare ones keep everything. One window
    // per cluster — fully parallel, no global sort.
    "km03_balanced_cluster_sample" -> ((spark: SparkSession, dir: String) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster"))
        .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      graft.ops.Clustering.kmeansAssignments(
          t(spark, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
        .withColumn("pick", row_number().over(w))
        .filter(col("pick") <= 30)
        .select(col("vec_id"), col("cluster"), col("pick"))
        .orderBy("vec_id")
    }),
  )

  private def distSql(qRel: String, cRel: String): String =
    s"""SELECT e.vec_id, c.cid,
       |    list_sum(list_transform(list_zip(e.q, c.m),
       |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))) AS dist
       |  FROM $qRel e CROSS JOIN $cRel c""".stripMargin

  // Two unrolled Lloyd rounds; generate_subscripts+unnest zip to per-dim
  // rows; SUM over BIGINT cast back from HUGEINT.
  private[queries] val kmeansSql: String =
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (
       |  SELECT vec_id AS cid, list_transform(q, x -> CAST(x AS DOUBLE)) AS m
       |  FROM q WHERE vec_id < 8),
       |d1 AS (
       |  ${distSql("q", "c0")}),
       |a1 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d1) WHERE rn = 1),
       |x1 AS (
       |  SELECT a1.cid, generate_subscripts(q.q, 1) AS dim, unnest(q.q) AS val
       |  FROM a1 JOIN q USING (vec_id)),
       |s1 AS (
       |  SELECT cid, dim, CAST(SUM(val) AS BIGINT) AS s, COUNT(*) AS cnt
       |  FROM x1 GROUP BY cid, dim),
       |c1 AS (
       |  SELECT cid, list(CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) ORDER BY dim) AS m
       |  FROM s1 GROUP BY cid),
       |d2 AS (
       |  ${distSql("q", "c1")}),
       |a2 AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM d2) WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "km01_kmeans" ->
      s"""$kmeansSql
         |SELECT vec_id, cid AS cluster FROM a2 ORDER BY vec_id""".stripMargin,

    "km02_cluster_profile" ->
      s"""$kmeansSql
         |SELECT a2.cid AS cluster, COUNT(*) AS n_members,
         |  COUNT(DISTINCT e.label) AS n_labels, AVG(e.label) AS avg_label
         |FROM a2 JOIN embeddings e USING (vec_id)
         |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "km03_balanced_cluster_sample" ->
      s"""$kmeansSql,
         |picked AS (
         |  SELECT vec_id, cid AS cluster,
         |    row_number() OVER (PARTITION BY cid
         |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick
         |  FROM a2)
         |SELECT vec_id, cluster, pick FROM picked
         |WHERE pick <= 30 ORDER BY vec_id""".stripMargin,
  )
}
