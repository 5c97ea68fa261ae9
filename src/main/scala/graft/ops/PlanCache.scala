package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of ANALYZED QUERY PLANS (lazy DataFrame handles)
  * for pure-DAG query families — the render evaluator's "plan
  * interning" (r18; r17 verdict #7).
  *
  * What is cached is the lazy plan object only, NEVER rows: every
  * action against a memoized handle re-executes the full computation
  * from the parquet inputs (PlanCacheSpec pins this by regenerating the
  * input file and watching the re-read change, and pins plan identity
  * against a fresh build). The key carries the data dir plus
  * [[Dedup.freshDigest]] of the driving input file, so a regenerated
  * input under the same path rebuilds instead of serving a stale file
  * listing (the r2 stale-data footgun rule, applied to plans); the
  * VALUE carries its owning session and is ignored for any other
  * session (a DataFrame is bound to the session that analyzed it).
  *
  * WHY (measured, r18): the render evaluator compiles a parsed
  * graphite target into a 40–100-operator DataFrame, and Spark analyzes
  * eagerly per Dataset transformation, so the compile costs 2–5× the
  * query's sf0.1 execution — re-paid identically on every invocation.
  * A serving deployment compiles a dashboard target once and re-serves
  * the plan; re-planning an UNCHANGED target per request is driver
  * overhead with no data dependence. At 100 TB the execution grows and
  * this driver constant does not — but the bench's per-key floor is
  * exactly this constant.
  *
  * Scope is deliberately NARROW (the verdict's blast-radius warning):
  * only query families whose construction is a pure DAG build — no
  * eager localCheckpoint (a later cache clear would evict its blocks
  * UNRECOVERABLY: truncated lineage cannot recompute), no
  * construction-time writes or driver collects, no streaming state.
  * The render family qualifies; streaming, rollup-materialization and
  * checkpoint-bearing keys must not be wrapped. Kill switch:
  * SPARK_GRAFT_PLAN_CACHE=0 (value semantics, [[enabled]]).
  */
object PlanCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  /** `=0` / `false` disable; unset or anything else keeps the cache on. */
  private[graft] def enabled(v: Option[String]): Boolean =
    v.forall(s => s != "0" && !s.equalsIgnoreCase("false"))

  private lazy val on = enabled(sys.env.get("SPARK_GRAFT_PLAN_CACHE"))

  /** Memoized `build` of a pure-DAG query frame. `file` is the driving
    * input whose (mtime, length) freshness keys the entry.
    */
  def memo(s: SparkSession, dir: String, file: String, key: String)(
      build: => DataFrame): DataFrame =
    if (!on) build
    else {
      val k = s"$key|$dir|${Dedup.freshDigest(s, dir, file)}"
      Option(cache.get(k)) match {
        case Some((sess, df)) if sess eq s => df
        case _ =>
          val df = build
          cache.put(k, (s, df))
          df
      }
    }
}
