package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import graft.SparkSpec

/** Pins the function-registration invariant between the two paths:
  * graft.GraftExtensions (session extension, applied at build and to
  * every newSession) must inject a SUPERSET of
  * VectorFunctions.registerAll's list — registerAll short-circuits on a
  * sentinel, so a function present in registerAll but missing from the
  * extension would silently never register in an extension-carrying
  * session (the exact bug this spec was written against: registerAll
  * once sentineled on vector_dot, the extension injected it, and
  * shingle_hashes vanished). */
class GraftExtensionsSpec extends SparkSpec {

  /** Keep in sync with BOTH registration sites. */
  private val allFunctions = Seq(
    "vector_dot", "vector_cosine", "simhash_bits",
    "shingles", "shingle_hashes", "minhash_sig", "gram_hashes", "window_mins",
    "heavy_hitters", "kmv_distinct", "topk_pairs", "bloom_agg", "bloom_contains")

  test("a fresh session resolves every engine function WITHOUT registerAll") {
    val fresh = spark.newSession() // extensions re-apply; registry starts clean
    val missing = allFunctions.filterNot(f =>
      fresh.sessionState.functionRegistry.functionExists(FunctionIdentifier(f)))
    assert(missing.isEmpty, s"extension-injected set is missing: $missing")
    // and they evaluate, not just resolve
    assert(fresh.sql("SELECT size(shingle_hashes('abcdefghij', 8)) AS n")
      .head.getInt(0) == 3)
    assert(fresh.sql(
      "SELECT topk_pairs(CAST(id AS DOUBLE), id, 2)[0].id AS top FROM range(10)")
      .head.getLong(0) == 9L)
  }

  test("registerAll on an extension-carrying session is a harmless no-op") {
    VectorFunctions.registerAll(spark)
    val missing = allFunctions.filterNot(f =>
      spark.sessionState.functionRegistry.functionExists(FunctionIdentifier(f)))
    assert(missing.isEmpty, s"after registerAll, missing: $missing")
  }
}
