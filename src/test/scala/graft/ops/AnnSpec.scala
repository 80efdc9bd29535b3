package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Contracts of the two-level (coarse -> fine) centroid assignment that
  * bounds the IVF broadcast at corpus-scale centroid counts (the
  * round-9 `weak` watch): equivalence with the exact flat assignment on
  * clustered data, and the threshold routing. */
class AnnSpec extends SparkSpec {

  private def registered(): Unit = graft.functions.VectorFunctions.registerAll(spark)

  /** 300 deterministic, pairwise non-proportional centroid embeddings:
    * a dominant per-(i mod 16) axis plus an i-specific integer pattern. */
  private def centroids(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val emb = Array.tabulate(16) { d =>
        val base = ((i * 31 + d * 17) % 13 - 6).toFloat
        if (d == i % 16) base + 20f else base
      }
      (i.toLong, emb)
    }.toDF("cent_id", "cent_emb")
  }

  test("two-level assignment equals flat on clustered vectors (C > threshold)") {
    registered()
    val n = 300 // > Ann.TwoLevelMinCentroids forces the two-level path
    assert(n > Ann.TwoLevelMinCentroids)
    val cents = centroids(n)
    import spark.implicits._
    // vectors are SCALED COPIES of the centroids (cosine 1 with their
    // own centroid, the provable-nearest case): two-level must route
    // each through its coarse cell to exactly the flat answer
    val vecs = (0 until n).map { i =>
      val emb = Array.tabulate(16) { d =>
        val base = ((i * 31 + d * 17) % 13 - 6).toFloat
        (if (d == i % 16) base + 20f else base) * 3f
      }
      (1000L + i, emb, s"v$i")
    }.toDF("vec_id", "embedding", "label")
    val flat = Ann.assignFlat(vecs, cents)
      .select("vec_id", "cent_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val two = Ann.assignToCentroids(vecs, cents) // routes two-level at n=300
      .select("vec_id", "cent_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(flat.length == n && two.length == n)
    assert(two.toSeq == flat.toSeq)
    // and the assignment is the self-evident one: vector i -> centroid i,
    // except the integer pattern repeats with period lcm(13,16)=208, so
    // centroid i >= 208 duplicates centroid i-208 and the deterministic
    // (cos desc, cent_id asc) tie-break picks the LOWER id — in BOTH paths
    assert(flat.forall { case (v, c) => c == (v - 1000L) % 208L })
  }

  test("below the threshold the flat exact path serves (bit-identical small case)") {
    registered()
    val cents = centroids(20)
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      val j = i % 20
      val emb = Array.tabulate(16) { d =>
        val base = ((j * 31 + d * 17) % 13 - 6).toFloat
        (if (d == j % 16) base + 20f else base) * 2f
      }
      (5000L + i, emb, s"w$i")
    }.toDF("vec_id", "embedding", "label")
    val out = Ann.assignToCentroids(vecs, cents)
      .select("vec_id", "cent_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size == 40)
    assert((0 until 40).forall(i => out(5000L + i) == (i % 20).toLong))
  }

  test("two-level coarse relation is sqrt-bounded") {
    registered()
    // structural check via the explicit entry point: nCoarse cells
    // really do confine each vector's fine candidates to one cell
    val cents = centroids(300)
    import spark.implicits._
    val vecs = Seq((9000L, Array.tabulate(16)(d =>
      (((7 * 31 + d * 17) % 13 - 6).toFloat + (if (d == 7) 20f else 0f)) * 5f), "x"))
      .toDF("vec_id", "embedding", "label")
    val out = Ann.assignTwoLevel(vecs, cents, nCoarse = 18)
      .select("cent_id").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(7L))
  }
}
