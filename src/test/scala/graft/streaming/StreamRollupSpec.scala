package graft.streaming

import graft.model.AggregationMethod
import graft.ops.{Ingest, Rollup}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** [[StreamRollup.CascadeStore]] — incremental coarse re-derivation
  * must equal the batch cascade over everything merged so far, with
  * touched buckets replaced and untouched rows carried forward.
  */
class StreamRollupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pts(rows: (String, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("metric", "ts_s", "value")
  }

  private def coarseRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq

  test("incremental cascade equals the batch cascade after each wave") {
    val store = new StreamRollup.CascadeStore(60, 300,
      AggregationMethod.Sum, 0.0)
    // wave 1: minutes 0, 1, 4 of the first 5m bucket + minute 5
    val w1 = pts(("m", 10L, 1.0), ("m", 70L, 2.0), ("m", 250L, 3.0),
      ("m", 310L, 10.0))
    // wave 2: a NEW minute in bucket 0 (touched → re-derived), an LWW
    // displacement of minute 1 (later raw ts wins), nothing in bucket
    // 300 (carried forward verbatim), and a new bucket 600
    val w2 = pts(("m", 130L, 5.0), ("m", 95L, 20.0), ("m", 610L, 7.0))

    def batchCascade(all: org.apache.spark.sql.DataFrame) =
      Rollup.propagate(Ingest.lwwAlign(all, 60), 60, 300,
        AggregationMethod.Sum, 0.0)
        .select("metric", "bucket_ts", "value", "known")

    store.mergeBatch(w1, 0L)
    assert(coarseRows(store.currentCoarse.get
        .select("metric", "bucket_ts", "value", "known")) ==
      coarseRows(batchCascade(w1)))

    store.mergeBatch(w2, 1L)
    val expected = coarseRows(batchCascade(w1.unionAll(w2)))
    assert(coarseRows(store.currentCoarse.get
        .select("metric", "bucket_ts", "value", "known")) == expected)
    // the displacement really happened: bucket 0 sums 1 + 20 + 5 + 3
    assert(expected.contains(("m", 0L, 29.0, 4L)))
    // and the untouched bucket survived
    assert(expected.contains(("m", 300L, 10.0, 1L)))
  }

  test("two-level chain: the touched set cascades and both levels track") {
    val store = new StreamRollup.CascadeStore(60, Seq(
      StreamRollup.Level(300, AggregationMethod.Sum, 0.0),
      StreamRollup.Level(3600, AggregationMethod.Sum, 0.0)))
    val w1 = pts(("m", 10L, 1.0), ("m", 310L, 2.0), ("m", 3700L, 5.0))
    val w2 = pts(("m", 20L, 10.0)) // displaces minute 0 → both levels
    store.mergeBatch(w1, 0L)
    store.mergeBatch(w2, 1L)
    def all(spp: Int) = store.level(spp).get
      .select("metric", "bucket_ts", "value").collect()
      .map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(all(300) == Seq((0L, 10.0), (300L, 2.0), (3600L, 5.0)))
    assert(all(3600) == Seq((0L, 12.0), (3600L, 5.0)))
  }

  test("xff gate applies to re-derived buckets") {
    // xff 0.5 over a 5-slot window: one known minute fails the gate,
    // three pass it — and the gate is re-evaluated on re-derivation
    val store = new StreamRollup.CascadeStore(60, 300,
      AggregationMethod.Average, 0.5)
    store.mergeBatch(pts(("m", 10L, 4.0)), 0L)
    assert(store.currentCoarse.get.count() == 0)
    store.mergeBatch(pts(("m", 70L, 6.0), ("m", 130L, 8.0)), 1L)
    val rows = store.currentCoarse.get.collect()
    assert(rows.length == 1 && rows.head.getDouble(2) == 6.0 &&
      rows.head.getLong(3) == 3L)
  }

  test("configured retention expires state per batch — R3 on the stream") {
    // fine keeps 600 s, coarse keeps 1200 s, clock pinned to 1300:
    // the wave's oldest minutes fall off the fine level immediately,
    // and a later clock advance expires coarse rows on the NEXT merge
    var nowS = 1300L
    val store = new StreamRollup.CascadeStore(60,
      Seq(StreamRollup.Level(300, AggregationMethod.Sum, 0.0,
        retentionS = Some(1200L))),
      fineRetentionS = Some(600L), clock = () => nowS)
    store.mergeBatch(pts(("m", 130L, 1.0), ("m", 700L, 2.0),
      ("m", 800L, 3.0), ("m", 1210L, 4.0)), 0L)
    // fine horizon 1300-600=700: the points at 130 (bucket 120) and 700
    // (bucket 660 < 700) expire; 800 (bucket 780) and 1210 survive
    val coarse1 = coarseRows(store.currentCoarse.get)
    assert(coarse1.map(_._2) == Seq(600L, 1200L),
      s"coarse after batch 0: $coarse1")
    // bucket 600 aggregates only the surviving minute (780 → 3.0)
    assert(coarse1.head._3 == 3.0 && coarse1.head._4 == 1L)
    // advance the clock past bucket 600's coarse horizon: the next
    // merge expires it even though the batch never touches it
    nowS = 2000L
    store.mergeBatch(pts(("m", 1950L, 9.0)), 1L)
    val coarse2 = coarseRows(store.currentCoarse.get)
    assert(coarse2.map(_._2) == Seq(1200L, 1800L),
      s"coarse after batch 1: $coarse2")
  }
}
