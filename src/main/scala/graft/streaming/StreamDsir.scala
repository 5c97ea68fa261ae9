package graft.streaming

import graft.ops.{PortableMath, Tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DSIR importance scoring — the ingest-time twin of the
  * batch serve fold (graft.ops.Curation.dsirWeight): each arriving
  * document is scored against the FROZEN bucket-weight model inside the
  * streaming plan, with no state store at all.
  *
  * The score is deliberately STATELESS: a document's `(n_tokens,
  * Σ wq·n)` derive entirely from its own row — the batch key's
  * explode → per-(doc, bucket) aggregate → broadcast join collapses to
  * one per-row integer fold over the token array (`transform` +
  * `aggregate` higher-order functions; ~dozens of md5/map lookups per
  * document, interpreted-eval cost bounded by tokens-per-doc), looking
  * the bucket weights up in a 1-row broadcast `map<int, bigint>` built
  * from the SAME persisted weight table the batch keys serve from. The
  * fold is exact BIGINT arithmetic end-to-end and the emitted weight is
  * the identical `⌊(2S+n)/(2n)⌋ / 1e6` half-up form — so a document
  * scores bit-identically whether it arrives in batch 1 or batch 100,
  * which is what the two-wave fixture + the SHARED batch oracle pin.
  *
  * At 100 TB this is the shape of ingest-time quality scoring: the
  * model is ≤256 rows (bytes), training happened once on a sample, and
  * the stream is map-side only — throughput is the scan rate. The
  * stream-static contract re-resolves the model per micro-batch, so a
  * model refresh lands without restarting the stream.
  */
object StreamDsir {

  /** Score arriving `(doc_id, text)` rows against `model` — a 1-row
    * static frame holding the bucket→micro-weight map as `wmap`
    * ([[modelMap]]). Output matches `dsir_weight`'s schema:
    * `(doc_id, n_tokens, dsir_weight)`. Documents with an empty token
    * array are dropped, matching the batch inner join (they never
    * produce a (doc, bucket) row there).
    */
  def scoreStream(arrivals: DataFrame, model: DataFrame): DataFrame = {
    // per-token micro-weight lookup: bucket = first md5 byte, the same
    // Tokens.byteBucket arithmetic as training. A bucket ABSENT from
    // the model (trained on a sample, or a new arrival with unseen
    // content) yields a NULL lookup — those tokens must vanish from
    // BOTH the sum and the token count, exactly like the batch serve's
    // inner join `docb JOIN wt USING (b)` (an unfiltered fold would
    // instead NULL the whole sum on ONE unseen token — review r14)
    val matched =
      s"filter(transform(${Tokens.toksExpr}, t -> " +
        s"element_at(wmap, ${Tokens.byteBucketExpr("md5(t)")})), " +
        "x -> x IS NOT NULL)"
    arrivals
      .crossJoin(broadcast(model))
      .withColumn("mw", expr(matched))
      .withColumn("n_tokens", size(col("mw")).cast("long"))
      // no matched token ⇒ no (doc, bucket) row in the batch join ⇒
      // the doc is absent from the batch output too
      .filter(col("n_tokens") > 0)
      .withColumn("sum_wqn",
        expr("aggregate(mw, CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("n_tokens"),
        expr("CAST(" + PortableMath.halfUpDivSql("sum_wqn", "n_tokens") +
          " AS DOUBLE) / 1e6").as("dsir_weight"))
  }

  /** The broadcastable model: the persisted `(b, wq)` weight table
    * collapsed to one `map<int, bigint>` row.
    */
  def modelMap(weights: DataFrame): DataFrame =
    weights.agg(
      map_from_entries(collect_list(struct(col("b"), col("wq")))).as("wmap"))
}
