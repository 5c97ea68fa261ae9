package graft.streaming

import graft.ops.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ≡ batch for the stream-static decontamination gate: the
  * full key fixture (two staged waves over the sf0.001 corpus) must
  * reproduce the batch operator row-for-row, and the per-row verdicts
  * must be arrival-order-independent (the statelessness claim).
  */
class StreamDecontaminateSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stream_decontaminate reproduces the batch gate row-for-row") {
    val streamed = StreamQueries.streamDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val batch = Curation.decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    // the fixture actually exercises both verdicts
    assert(streamed.exists(_._3 == 1) && streamed.exists(_._3 == 0))
  }

  test("the gate is stateless: each doc decided once, waves irrelevant") {
    // every corpus doc appears exactly once in the output — the file
    // source processed each staged file once and no state merged or
    // split rows across the wave boundary
    val out = StreamQueries.streamDecontaminate(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") >= Curation.BenchmarkDocs).count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
  }
}
