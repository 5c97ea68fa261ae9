package graft.streaming

import graft.ops.PipelineOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamSessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val gap = PipelineOps.SessionGapS // 1800

  test("closed streaming sessions equal the batch sessionize rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1000000L
    // metric m: two sessions split by a gap; boundary event at EXACTLY
    // gap seconds after its predecessor stays in-session (the batch
    // rule's <=); metric n: a lone event
    val events = Seq(
      ("m", t0, 1.0), ("m", t0 + 100, 1.0), ("m", t0 + 100 + gap, 1.0),
      ("m", t0 + 100 + gap + gap + 1, 2.0), // > gap after prev → new session
      ("n", t0 + 50, 3.0))

    val stream = MemoryStream[(String, Long, Double)]
    val points = stream.toDF().toDF("metric", "ts_s", "value")
    val q = StreamSessionize.sessionizeStream(points, gap, "10 seconds")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions")
      .start()
    stream.addData(events: _*)
    q.processAllAvailable()
    // push the watermark far past every session's end so all finalize
    stream.addData(("zz", t0 + 10 * gap, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = PipelineOps.sessionizeFrom(
        events.toDF("metric", "ts_s", "value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // and the shape is what the scaladoc promises: m split exactly once
    assert(got.count(_._1 == "m") == 2)
    assert(got.filter(_._1 == "m").map(_._3).toSeq.sorted == Seq(1L, 3L))
  }

  test("a session stays open (unemitted) until the watermark passes it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 2000000L
    val stream = MemoryStream[(String, Long, Double)]
    val points = stream.toDF().toDF("metric", "ts_s", "value")
    val q = StreamSessionize.sessionizeStream(points, gap, "10 seconds")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("open_sessions")
      .start()
    stream.addData(("m", t0, 1.0))
    q.processAllAvailable()
    assert(spark.table("open_sessions").isEmpty) // could still grow
    stream.addData(("m", t0 + 10 * gap, 1.0)) // watermark jumps past it
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("open_sessions").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(("m", t0, 1L, 0L)))
  }
}
