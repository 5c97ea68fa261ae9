package graft.streaming

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the stream-static DSIR scorer: the full key
  * fixture (two staged doc_id waves over the sf0.001 corpus, scored
  * against the persisted weight table collapsed to a broadcast map)
  * must reproduce the batch serve fold BIT-for-bit — n_tokens,
  * and the exactly-derived weight double — and each document must be
  * scored exactly once regardless of which wave delivered it (the
  * statelessness claim).
  */
class StreamDsirSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream_dsir reproduces the batch serve fold bit-for-bit") {
    val streamed = StreamQueries.streamDsir(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val batch = Curation.dsirWeight(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty)
    // == on the Double is deliberate: the weight is derived from an
    // exact integer with one correctly-rounded /1e6, so the streamed
    // per-row fold and the batch aggregate must agree in every bit
    assert(streamed.toSeq == batch.toSeq)
  }

  test("the scorer is stateless: each doc scored once, waves irrelevant") {
    val out = StreamQueries.streamDsir(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
  }
}
