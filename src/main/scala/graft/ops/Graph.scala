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

  /** Connected components by alternating large-star / small-star rounds
    * (the MapReduce CC method of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round every node hooks its
    * larger neighbors (large-star), then its smaller neighbors
    * (small-star), onto the minimum of its neighborhood. The edge set
    * collapses toward min-rooted stars in O(log n) rounds REGARDLESS of
    * graph diameter — use this instead of [[connectedComponents]] when
    * the graph can be long-chained (general graph analytics); min-label
    * propagation stays the cheaper choice for the shallow similarity
    * clusters dedup produces (1 shuffle per round vs 2, and diameter ≈ 2
    * there).
    *
    * Same contract as [[connectedComponents]]: (id, component) for every
    * endpoint id, component = min reachable id; deterministic fixpoint.
    */
  def connectedComponentsStar(
      pairs: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 30): DataFrame = {
    // Every endpoint id must get a label (contract parity with
    // connectedComponents) — self-pairs drop out of the edge set but
    // their ids still label themselves.
    val allIds = pairs.select(col(srcCol).as("id"))
      .union(pairs.select(col(dstCol).as("id")))
      .distinct()
      .localCheckpoint(true)
    var edges = pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true) // same lineage-truncation rationale as above
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR: for each u over the SYMMETRIC neighborhood, hook every
      // strictly larger neighbor v to m(u) = min(N(u) ∪ {u}).
      val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
        .select(col("a").as("u"), col("b").as("v"))
      val mU = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = sym.join(mU, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")) // a > b by construction
        .distinct()
      // SMALL-STAR: edges now point high -> low; for each u hook all its
      // smaller neighbors (and u itself) to the minimum one.
      val mSmall = afterLarge.groupBy(col("a").as("u")).agg(min(col("b")).as("m"))
      val afterSmall = afterLarge
        .join(mSmall, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .union(mSmall.select(col("u").as("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint(true)
      // Fixpoint: the directed edge set stopped changing.
      val changed = afterSmall.union(edges).except(afterSmall.intersect(edges)).count()
      edges = afterSmall
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds — " +
          "O(log n) bound exceeded; raise maxIter")
    // Fixpoint edges are min-rooted stars: every node points at its
    // component min. Roots appear only on the b side; ids with no
    // surviving edge (self-pairs) label themselves.
    val starLabels = edges.select(col("a").as("id"), col("b").as("component"))
      .union(edges.select(col("b").as("id"), col("b").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
    allIds.join(starLabels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Cluster summary: one row per component with its size and member id
    * range. The keeper for "keep one per cluster" is min_id, which by
    * construction equals the component label. */
  def componentSummary(cc: DataFrame): DataFrame =
    cc.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
}
