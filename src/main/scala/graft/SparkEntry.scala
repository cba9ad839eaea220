package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CurationQueries, PipelineQueries, QueueQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory
  * each entry maps to. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ QueueQueries.queries ++
      PipelineQueries.queries ++ AnalyticsQueries.queries ++
      CurationQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ QueueQueries.oracles ++
      PipelineQueries.oracles ++ AnalyticsQueries.oracles ++
      CurationQueries.oracles

  /** Untimed warm-up of the persisted shared artifacts (walk corpora,
    * pair graph, indexes, exports) any of `names` consume: a query's
    * FIRST run must measure the query, not the one-time memoized
    * artifact build it happens to trigger (the r11 subset-bench
    * distortion). Idempotent; cheap when already built. */
  def prime(spark: SparkSession, dir: String, names: Set[String]): Unit = {
    RelationalQueries.prime(spark, dir, names)
    PipelineQueries.prime(spark, dir, names)
    AnalyticsQueries.prime(spark, dir, names)
    CurationQueries.prime(spark, dir, names)
  }
}
