package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The engine's single `spark.sql.extensions` entry point — set by
  * GraftSession/Verify/Bench at session build (and the production
  * `spark-submit --conf spark.sql.extensions=graft.GraftExtensions`
  * path). Composes the two extension surfaces:
  *
  *  - [[graft.functions.GraftExtensions]]: the native expression
  *    registry (vector_dot, vector_cosine, simhash_bits, heavy_hitters,
  *    bloom_agg/bloom_contains, ...) so SQL-only clients get the
  *    codegen'd kernels without a driver-side registerAll;
  *  - [[graft.catalog.ResolveDvSnapshots]]: the analyzer rule that
  *    serves deletion-vector-carrying TxLog snapshots through the SQL
  *    catalog by swapping the relation for the merge-on-read plan at
  *    analysis time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    new graft.functions.GraftExtensions().apply(ext)
    ext.injectResolutionRule(graft.catalog.ResolveDvSnapshots.apply)
  }
}
