package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamAsofSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming as-of carries the previous observation across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long, Double)]
    val carried = StreamAsof.asofStream(stream.toDS().map {
      case (id, m, ts, v) => StreamAsof.PointArrival(id, m, ts, v)
    })
    val q = carried.writeStream.format("memory")
      .queryName("asof_out").outputMode("append").start()

    // batch 1, metric a: OUT-OF-ORDER arrival within the batch (ts 20
    // before ts 10) must still chain in event-time order; metric b: one
    // point (its prev is NULL)
    stream.addData((2L, "a", 20L, 2.0), (1L, "a", 10L, 1.0),
      (10L, "b", 5L, 7.0))
    q.processAllAvailable()
    // batch 2: metric a continues PAST the state (prev = ts 20), and a
    // same-ts tie (ids 4, 5 at ts 40) must chain by event_id
    stream.addData((3L, "a", 30L, 3.0), (4L, "a", 40L, 4.0),
      (5L, "a", 40L, 5.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("asof_out").collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(4)) None
        else Some((r.getLong(4), r.getDouble(5), r.getLong(6)))))
      .toMap
    assert(rows.size == 6)
    assert(rows(1L).isEmpty) // first-ever 'a' point (event-time first)
    assert(rows(2L).contains((10L, 1.0, 10L))) // in-batch, event-time prev
    assert(rows(10L).isEmpty) // first 'b' point
    assert(rows(3L).contains((20L, 2.0, 10L))) // prev from batch-1 STATE
    assert(rows(4L).contains((30L, 3.0, 10L)))
    assert(rows(5L).contains((40L, 4.0, 0L))) // same-ts tie chains by id
  }
}
