package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming near-duplicate probe for EMBEDDINGS — the SRP-LSH analog
  * of [[StreamDecontaminate]]'s text gate: each arriving vector is
  * flagged against the STATIC persisted signature index
  * ([[Similarity.srpIndexShared]]) inside the streaming plan itself,
  * with no state store.
  *
  * Stateless by construction: the arriving vector's 4 band keys derive
  * entirely from its own row ([[Similarity.withSrpBands]] — 16
  * codegen'd literal-plane dot products, map-side), and the index side
  * collapses to 4 per-band bucket tables (band_key → sorted member-id
  * array) that ride broadcast stream-static joins. The row's verdict —
  * how many index vectors share ≥1 band bucket with it — is identical
  * whichever micro-batch it arrives in, which the two-wave fixture +
  * batch oracle pin.
  *
  * At 100 TB: this is the ingest-time shape of "is this embedding a
  * near-dup of anything we already hold" — the signature index is the
  * corpus-sized artifact, but what streams through the join is only
  * the 4 bucket rows each arrival hashes to; a production deployment
  * would cap or count-collapse pathological buckets (a hot bucket's id
  * array is the one data-dependent size here) and shard the bucket
  * tables instead of broadcasting when the corpus outgrows executor
  * memory.
  */
object StreamSrpProbe {

  /** Per-band bucket tables from the signature index: `(band_key,
    * ids)` with the member ids sorted — static-side aggregation, built
    * once per stream.
    */
  def bucketTables(sigs: DataFrame): Seq[DataFrame] =
    (0 until Similarity.SrpBands).map { b =>
      sigs.groupBy(col(s"band$b"))
        .agg(sort_array(collect_set(col("vec_id"))).as(s"ids$b"))
    }

  /** Flag each arriving `(vec_id, embedding)` row: `n_mates` = distinct
    * index vectors sharing at least one band bucket (self excluded —
    * arrivals are index members, so their own id always collides in
    * all four bands), `has_mate` the 0/1 gate. Append-mode safe: no
    * watermark, no streaming aggregation.
    */
  def probeStream(arrivals: DataFrame, buckets: Seq[DataFrame]): DataFrame = {
    val banded = Similarity.withSrpBands(arrivals)
    val joined = (0 until Similarity.SrpBands).foldLeft(banded) { (df, b) =>
      df.join(broadcast(buckets(b)), Seq(s"band$b"), "left")
    }
    val union = array_distinct(concat(
      (0 until Similarity.SrpBands).map(b =>
        coalesce(col(s"ids$b"), array().cast("array<bigint>"))): _*))
    // "self" is subtracted only when the arrival actually IS an index
    // member — a NOVEL vector's bucket mates all count (the constant −1
    // would have off-by-one'd exactly the ingest-time case the module
    // exists for, down to n_mates = −1 on an all-empty probe)
    val mates = (size(union) -
      array_contains(union, col("vec_id")).cast("int")).cast("long")
    joined.select(col("vec_id"),
      mates.as("n_mates"),
      (mates > 0).cast("int").as("has_mate"))
  }
}
