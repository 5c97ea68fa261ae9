package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2's inventory;
  * every key that is ANSI-SQL-expressible also appears in [[oracleSql]]
  * with DuckDB SQL producing the identical (column-name-matched, ordered,
  * 6-decimal-rounded, NULL-not-NaN) result on the same parquet tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Fetch.fetchDenseSeries(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++
      graft.sources.WspQueries.queries ++ graft.streaming.StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql ++
      graft.sources.WspQueries.oracleSql ++ graft.streaming.StreamQueries.oracleSql
}
