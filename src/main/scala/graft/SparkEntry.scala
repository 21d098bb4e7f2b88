package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's demo query; each key
  * with a DuckDB-runnable equivalent also appears in `oracleSql` (hash-match
  * gate), the rest get the weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.FuzzyQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.TransformerQueries.queries ++
      graft.queries.GeoStreamQueries.queries ++
      graft.queries.TopicQueries.queries ++
      graft.queries.SourceQueries.queries ++
      graft.queries.AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.FuzzyQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.TransformerQueries.oracleSql ++
      graft.queries.GeoStreamQueries.oracleSql ++
      graft.queries.TopicQueries.oracleSql ++
      graft.queries.SourceQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql
}
