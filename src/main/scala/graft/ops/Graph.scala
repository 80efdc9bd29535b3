package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph ops for dedup post-processing: near-dup
  * PAIRS become duplicate CLUSTERS via connected components.
  *
  * Algorithm: iterative min-label propagation (each node takes the
  * minimum label among itself and its neighbors until fixpoint) — the
  * DataFrame-only core of the large-star/small-star method. Converges in
  * O(graph diameter) iterations; dedup similarity graphs are
  * short-diameter by construction (clusters of near-identical docs), so
  * the loop is shallow. Each iteration is one equi-join + one aggregate;
  * intermediate labels are cached and convergence is checked by count —
  * on a cluster you'd localCheckpoint every few iterations to truncate
  * lineage.
  *
  * Deterministic: the fixpoint (min reachable id per component) is unique
  * regardless of execution order.
  */
object Graph {

  /** pairs(srcCol, dstCol) -> (id, component) for every endpoint id,
    * where component = min id reachable through the pair graph. */
  def connectedComponents(
      pairs: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 50): DataFrame = {
    // localCheckpoint (eager) after every step: an iterative DataFrame
    // algorithm that merely cache()s keeps the WHOLE upstream logical plan
    // (here: the MinHash/LSH expression tree) nested one level deeper per
    // iteration, and Catalyst re-analyzes that growing tree each time —
    // at sf0.1 the loop stopped finishing at all. Checkpointing replaces
    // the plan with the materialized partitions, making each iteration
    // O(edges), independent of upstream plan size.
    val edges = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val viaNeighbor = edges
        .join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaNeighbor)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(graph diameter exceeds maxIter) — raise maxIter; returning " +
          "partial labels would silently split real components")
    labels
  }

  /** Cluster summary: one row per component with its size and member id
    * range. The keeper for "keep one per cluster" is min_id, which by
    * construction equals the component label. */
  def componentSummary(cc: DataFrame): DataFrame =
    cc.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
}
