package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AnalyticsQueries, ExtQueries, RefQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full 37-field station enrichment (`video_processor.py:281-319`)
    * over deterministic synthetic links.
    */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.flagshipStation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ ExtQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ ExtQueries.oracle ++ AnalyticsQueries.oracle
}
