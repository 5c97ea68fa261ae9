package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming exact dedup dedups within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val decided = StreamDedup.dedupStream(
      stream.toDS().map { case (id, h) => StreamDedup.DocArrival(id, h) })
    val q = decided.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()

    // batch 1: hash A twice (ids 7, 3 — min wins) PLUS an exact
    // at-least-once redelivery of the winner (3 again), hash B once
    stream.addData((7L, "A"), (3L, "A"), (3L, "A"), (11L, "B"))
    q.processAllAvailable()
    // batch 2: hash A again (dup across batches), hash C new
    stream.addData((20L, "A"), (21L, "C"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("dedup_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getLong(3)))
    assert(rows.length == 6) // every arrival gets a decision
    // the redelivered winner yields ONE is_first, not two
    assert(rows.count { case (id, h, f, _) => id == 3L && h == "A" && f } == 1)
    assert(rows.count { case (id, h, _, _) => id == 3L && h == "A" } == 2)
    val byId = rows.map(r => r._1 -> r).toMap
    // min id of the first batch owns hash A; the other arrival is a dup
    // (id 3's rows asserted above: one is_first=true, one redelivery)
    assert(rows.filter(_._1 == 3L).forall(_._4 == 3L))
    assert(byId(7L) == ((7L, "A", false, 3L)))
    // cross-batch dup resolves against state, to the same canonical id
    assert(byId(20L) == ((20L, "A", false, 3L)))
    // fresh hashes are firsts
    assert(byId(11L) == ((11L, "B", true, 11L)))
    assert(byId(21L) == ((21L, "C", true, 21L)))
    // exactly one is_first per distinct hash
    assert(rows.filter(_._3).map(_._2).sorted.sameElements(Seq("A", "B", "C")))
  }
}
