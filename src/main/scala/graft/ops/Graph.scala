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

  /** Order-independent relation signature for fixpoint detection:
    * (row count, sum of xxhash64(cols), sum of xxhash64(cols reversed)).
    * One single-pass aggregation over a (checkpointed) relation replaces
    * the per-round set-op / join jobs a literal set-equality check
    * costs — the classic iterate-until-stable pattern at scale. Sums are
    * accumulated in decimal(38,0) so ANSI overflow can't trip, and the
    * two independent 64-bit sums make a silent false-fixpoint need a
    * simultaneous collision in both (~2^-128 for non-adversarial data).
    * Relations compared are DISTINCT by construction, so multiset vs set
    * ambiguity does not arise. */
  private def signature(df: DataFrame, cols: Seq[String]): (Long, BigDecimal, BigDecimal) = {
    val h1 = xxhash64(cols.map(col): _*).cast("decimal(38,0)")
    val h2 = xxhash64(cols.reverse.map(col): _*).cast("decimal(38,0)")
    val r = df.agg(count(lit(1)), sum(h1), sum(h2)).head()
    def dec(i: Int): BigDecimal =
      if (r.isNullAt(i)) BigDecimal(0) else BigDecimal(r.getDecimal(i))
    (r.getLong(0), dec(1), dec(2))
  }

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
    var labelsSig = signature(labels, Seq("id", "component"))
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
      // Fixpoint via relation signature (see signature()) — one agg job
      // over the checkpointed labels instead of a join+filter+count.
      val nextSig = signature(next, Seq("id", "component"))
      labels = next
      converged = nextSig == labelsSig
      labelsSig = nextSig
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
    var edgesSig = signature(edges, Seq("a", "b"))
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
      // Fixpoint: the directed edge set stopped changing — detected by
      // relation signature (one agg job) instead of the
      // union/except/intersect triple-set-op it replaces.
      val afterSig = signature(afterSmall, Seq("a", "b"))
      edges = afterSmall
      converged = afterSig == edgesSig
      edgesSig = afterSig
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

  /** Exact triangle count + global clustering coefficient over an
    * undirected pair graph (Suri & Vassilvitskii, "Counting Triangles and
    * the Curse of the Last Reducer", WWW'11).
    *
    * Scale design: edges are oriented low -> high by (degree, id) BEFORE
    * the wedge join, so every wedge is enumerated at its lowest-degree
    * vertex — per-vertex join fan-out is bounded by O(sqrt(m)) on any
    * graph instead of by the max degree. Without the orientation, one
    * celebrity node with degree d contributes d^2 wedge rows (the "last
    * reducer" that never finishes at 100 TB); with it, each triangle is
    * produced exactly once by two equi-joins, no DISTINCT pass and no
    * post-hoc division by 3/6. The edge relation is localCheckpointed:
    * it feeds the degree agg, both wedge sides, and the closing join,
    * and would otherwise replay its upstream subtree four times.
    *
    * Output (one row): n_nodes, n_edges, n_wedges, n_triangles, and
    * global_clustering = 3 * triangles / wedges (one IEEE division of
    * exact int64 operands — engine-deterministic). */
  def triangleStats(pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val edges = pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)
    // localCheckpoint: deg feeds both rank joins AND the wedge total — the
    // 2|E|-row union+groupBy must not re-execute three times
    val deg = edges.select(col("a").as("id")).union(edges.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // total (degree, id) order: rank every edge endpoint, orient src -> dst
    val ranked = edges
      .join(deg.select(col("id").as("a"), struct(col("deg"), col("id")).as("ka")), "a")
      .join(deg.select(col("id").as("b"), struct(col("deg"), col("id")).as("kb")), "b")
    val oriented = ranked.select(
        when(col("ka") < col("kb"), col("a")).otherwise(col("b")).as("src"),
        when(col("ka") < col("kb"), col("b")).otherwise(col("a")).as("dst"),
        when(col("ka") < col("kb"), col("kb")).otherwise(col("ka")).as("kdst"))
      .localCheckpoint(true)
    // wedges at the lowest vertex; the closing edge is oriented too, so
    // each triangle {a<b<c} matches exactly once: (a->b, a->c) closed by b->c
    val x = oriented.select(col("src"), col("dst").as("d1"), col("kdst").as("k1"))
    val y = oriented.select(col("src"), col("dst").as("d2"), col("kdst").as("k2"))
    val wedges = x.join(y, Seq("src")).filter(col("k1") < col("k2"))
    val closing = oriented.select(col("src").as("d1"), col("dst").as("d2"))
    val triangles = wedges.join(closing, Seq("d1", "d2"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedgeTotal = deg.agg(
      count(lit(1)).as("n_nodes"),
      // per-node deg*(deg-1) accumulates in decimal(38,0) — a celebrity
      // node of degree >= ~3e9 would wrap plain int64 exactly in the
      // hot-node regime this function exists for (DuckDB's SUM is HUGEINT
      // there; see signature() above for the same convention). `div 2` is
      // exact: the sum is always even.
      expr("cast(sum(cast(deg as decimal(38,0)) * (deg - 1)) div 2 as bigint)")
        .as("n_wedges"))
    val edgeTotal = edges.agg(count(lit(1)).as("n_edges"))
    wedgeTotal.crossJoin(edgeTotal).crossJoin(triangles) // three 1-row relations
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        (col("n_triangles").cast("double") * 3.0 / col("n_wedges").cast("double"))
          .as("global_clustering"))
  }

  /** k-core: the maximal subgraph where every node has degree >= k —
    * the standard "dense backbone" extraction (community seeds, spam
    * rings, influence cores). Computed by iterative peeling: drop every
    * node whose CURRENT degree is < k, re-derive degrees, repeat until
    * the edge set stops shrinking (the fixpoint is the k-core, unique
    * regardless of removal order — Batagelj & Zaversnik 2003).
    *
    * Scale design: each round is one symmetric-degree aggregation (a
    * map-side-combinable groupBy over 2|E| endpoint rows) plus two
    * left_semi joins that keep only edges whose BOTH endpoints survive —
    * all keyed operations, no collect, no per-node driver state. Edges
    * are localCheckpointed per round (the relation feeds the degree agg
    * and both semi-joins, and iterative lineage would otherwise replay
    * the whole peel history each round). Convergence is detected by edge
    * count alone: peeling only ever REMOVES edges, so an unchanged count
    * is an unchanged relation — no signature needed. Rounds are bounded
    * by the graph's degeneracy ordering depth; real similarity/co-link
    * graphs converge in a handful.
    *
    * Returns (id, deg): every node in the k-core with its within-core
    * degree (all >= k by definition).
    */
  def kCore(pairs: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var edges = pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = edges.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter && nEdges > 0) {
      val deg = edges.select(col("a").as("id")).union(edges.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("id")).localCheckpoint(true)
      val next = edges
        .join(keep.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("id").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges
      edges = next
      nEdges = n
      iter += 1
    }
    if (!converged && nEdges > 0)
      throw new IllegalStateException(
        s"kCore did not converge in $maxIter rounds; raise maxIter")
    edges.select(col("a").as("id")).union(edges.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
  }
}
