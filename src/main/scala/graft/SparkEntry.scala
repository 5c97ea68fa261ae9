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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * The render family's entries are wrapped in [[PlanCache.memo]]
    * (r18; r17 verdict #7): the evaluator compiles a parsed target into
    * a 40–100-operator DataFrame whose eager per-Dataset analysis costs
    * 2–5× the query's sf0.1 execution, re-paid per invocation with no
    * data dependence — the memo re-serves the analyzed plan while every
    * action still computes from the parquet inputs (see PlanCache's
    * scaladoc for the freshness/session keying and why the scope is
    * exactly the pure-DAG render family and nothing stateful).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val base = CoreQueries.queries ++ ExtQueries.queries ++
      graft.sources.WspQueries.queries ++ graft.streaming.StreamQueries.queries
    base.map {
      case (k, fn) if k.startsWith("render_target") =>
        k -> ((s: SparkSession, d: String) =>
          PlanCache.memo(s, d, "events.parquet", k)(fn(s, d)))
      case other => other
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql ++
      graft.sources.WspQueries.oracleSql ++ graft.streaming.StreamQueries.oracleSql
}
