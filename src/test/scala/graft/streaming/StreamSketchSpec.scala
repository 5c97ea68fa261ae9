package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the HLL register fold: max-merge across
  * micro-batches must land exactly on the batch sketch over everything
  * streamed — the mergeability property the key exists to demonstrate.
  */
class StreamSketchSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream_sketch reproduces the batch sketch exactly") {
    val streamed = StreamQueries.streamSketch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val batch = Dedup.sketchHll(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // identical row, not merely close: register maxima are
    // order-independent, so wave splitting cannot move the estimate
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stream_cms reproduces the batch sketch exactly (sum-merge)") {
    val streamed = StreamQueries.streamCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Dedup.sketchCms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // counting is linear: summed per-batch counters == one-shot counters
    assert(streamed.toSeq == batch.toSeq)
  }
}
