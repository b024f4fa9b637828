package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{DedupQueries, EventsQueries, GraphQueries, KMeansQueries, MultimodalQueries, PipelineQueries, RelationalQueries, SimilarityQueries, StatsQueries, StreamQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in per-domain modules under `graft.queries`; this
  * object only aggregates them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    KMeansQueries.assign(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    KMeansQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++ EventsQueries.queries ++
      RelationalQueries.queries ++ MultimodalQueries.queries ++ StatsQueries.queries ++
      PipelineQueries.queries ++ StreamQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    KMeansQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++ EventsQueries.oracles ++
      RelationalQueries.oracles ++ MultimodalQueries.oracles ++ StatsQueries.oracles ++
      PipelineQueries.oracles ++ StreamQueries.oracles ++ GraphQueries.oracles
}
