package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.pipeline.{AnalyticsQueries, ConformanceQueries, CoreQueries, CurationQueries, ExtraQueries, FlowQueries, LLMQueries, TrainingQueries}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q2StarJoin(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ FlowQueries.queries ++ LLMQueries.queries ++
      ExtraQueries.queries ++ TrainingQueries.queries ++
      AnalyticsQueries.queries ++ CurationQueries.queries ++
      ConformanceQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ FlowQueries.oracles ++ LLMQueries.oracles ++
      ExtraQueries.oracles ++ TrainingQueries.oracles ++
      AnalyticsQueries.oracles ++ CurationQueries.oracles ++
      ConformanceQueries.oracles
}
