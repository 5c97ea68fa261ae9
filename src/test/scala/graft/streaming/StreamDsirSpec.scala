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

  test("unseen-bucket tokens vanish from sum AND count, like the batch join") {
    // a model covering only SOME buckets: tokens hashing elsewhere must
    // not NULL the fold (r14 review) — they drop from n_tokens and
    // sum_wqn exactly as the batch inner join drops their (doc, b) rows
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha alpha")).toDF("doc_id", "text")
    val fullModel = docs.select(explode(expr(graft.ops.Tokens.toksExpr)).as("t"))
      .select(expr(graft.ops.Tokens.byteBucketExpr("md5(t)")).as("b")).distinct()
      .withColumn("wq", lit(1000L) * col("b"))
    // drop ONE bucket from the model: whatever bucket 'beta' lands in
    val betaB = fullModel.select(expr(
      graft.ops.Tokens.byteBucketExpr("md5('beta')"))).head().getInt(0)
    val partial = StreamDsir.modelMap(fullModel.filter(col("b") =!= betaB))
    val scored = StreamDsir.scoreStream(docs, partial).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // doc 1: 'beta' (and any same-bucket sibling) dropped; the rest
    // scored — recompute independently
    val toks1 = "alpha beta gamma delta epsilon zeta".split(' ')
    val md5b = (t: String) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16)
    }
    val kept = toks1.map(md5b).filter(_ != betaB)
    assert(scored(1L)._1 == kept.length.toLong)
    val s = kept.map(_ * 1000L).sum
    val micro = {
      val (a, b) = (2 * s + kept.length, 2L * kept.length)
      (a - (((a % b) + b) % b)) / b
    }
    assert(scored(1L)._2 == micro.toDouble / 1e6)
    // doc 2's bucket is present: straightforward full score
    assert(scored(2L)._1 == 2L)
  }
}
