package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` aggregates every query module's declared operators; each key
  * with an entry in `oracleSql` is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the q05-style star join (broadcast dims + two key-shuffle joins). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.defs("q05_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ WindowQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ IngestQueries.defs ++ ExtendedQueries.defs ++
      TemporalQueries.defs ++ TpchDeepQueries.defs ++ CurationQueries.defs ++
      ClusteringQueries.defs ++ ChangeQueries.defs ++ ProfilingQueries.defs ++
      QualityQueries.defs ++ LayoutQueries.defs ++ LakeQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ WindowQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ DedupQueries.oracles ++ SimilarityQueries.oracles ++
      MultimodalQueries.oracles ++ IngestQueries.oracles ++ ExtendedQueries.oracles ++
      TemporalQueries.oracles ++ TpchDeepQueries.oracles ++ CurationQueries.oracles ++
      ClusteringQueries.oracles ++ ChangeQueries.oracles ++ ProfilingQueries.oracles ++
      QualityQueries.oracles ++ LayoutQueries.oracles ++ LakeQueries.oracles
}
