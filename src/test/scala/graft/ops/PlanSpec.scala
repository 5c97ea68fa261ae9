package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md north star: pushdown, pruning and
  * join strategy must survive refactors — "the plan you'd want, not the
  * first one that passed").
  */
class PlanSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("fetch queries push the time range into the parquet scan") {
    for (q <- Seq(Fetch.fetchDenseSeries(spark, dir),
                  CoreQueries.fetchRangeFilter(spark, dir))) {
      val p = plan(q)
      assert(p.contains("PushedFilters") &&
        (p.contains("GreaterThanOrEqual(ts") || p.contains("GreaterThan(ts")),
        s"time bound did not reach the scan:\n$p")
    }
  }

  test("scan_points prunes to the three needed columns") {
    val p = plan(CoreQueries.scanPoints(spark, dir))
    assert(!p.contains("user_id") && !p.contains("props") && !p.contains("event_id"),
      s"scan reads more columns than the projection needs:\n$p")
  }

  test("fetch_dense_series joins spine to aggregate without a sort-merge shuffle") {
    val p = plan(Fetch.fetchDenseSeries(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast join for the bounded spine:\n$p")
  }

  test("LWW dedup and rollups aggregate with map-side combine, no window") {
    // max_by over a struct ordering key plans as SortAggregate (struct
    // buffers aren't hash-aggregable) — that's fine: what matters at
    // scale is the partial_ (map-side) step bounding shuffle volume by
    // distinct buckets, and the absence of a per-partition Window sort
    // over raw rows.
    for (q <- Seq(CoreQueries.upsertBatchLww(spark, dir),
                  CoreQueries.rollupCascade5m(spark, dir))) {
      val p = plan(q)
      assert(!p.contains("Window"), s"unexpected window operator:\n$p")
      assert(p.contains("partial_"), s"expected map-side partial aggregation:\n$p")
    }
  }

  test("similarity_topk broadcasts the query side") {
    val p = plan(Similarity.similarityTopk(spark, dir))
    assert(p.contains("Broadcast"), s"query side should broadcast:\n$p")
  }
}
