package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2 plus the
  * training-data-pipeline extensions; `oracleSql` holds the DuckDB-equivalent
  * SQL for the SQL-expressible subset (kernel ops are covered by
  * property/golden ScalaTest specs instead, SURVEY.md §5).
  */
object SparkEntry {
  /** Flagship: full PFSA fit+predict pipeline (reference detection.py:77-163)
    * on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    relational.PipelineQueries.pipelineFitPredict(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline family (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relational.RelationalQueries.queries ++ relational.PipelineQueries.queries ++
      relational.DataPipelineQueries.queries ++ relational.AnalyticsQueries.queries ++
      relational.SeriesQueries.queries ++ relational.QualityQueries.queries ++
      relational.SearchQueries.queries ++ relational.EmbedQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    relational.RelationalQueries.oracle ++ relational.DataPipelineQueries.oracle ++
      relational.PipelineQueries.oracle ++ relational.AnalyticsQueries.oracle ++
      relational.SeriesQueries.oracle ++ relational.QualityQueries.oracle ++
      relational.SearchQueries.oracle ++ relational.EmbedQueries.oracle
}
