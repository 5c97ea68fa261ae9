package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark-decontamination gate — the STREAM-STATIC JOIN
  * pattern (the one Structured Streaming join family the other six
  * streaming keys don't exercise): each arriving document is flagged
  * against a STATIC benchmark shingle set inside the streaming plan
  * itself, with no state store at all.
  *
  * The gate is deliberately STATELESS: a document's shingles derive
  * entirely from its own row ([[Dedup.shingleArray]] — no explode), and
  * the benchmark side collapses to one broadcastable array row, so
  * flagging is a per-row `array_intersect` under a broadcast
  * stream-static join. No watermark, no output-mode constraint, no
  * cross-batch handoff — a document's verdict is identical whether it
  * arrives in batch 1 or batch 100, which is exactly the property the
  * two-wave fixture + batch oracle pin.
  *
  * At 100 TB: this is the shape of an INGEST-TIME contamination filter —
  * the benchmark suite (fixed, ~10⁵-10⁶ shingles ≈ tens of MB) rides a
  * broadcast; the corpus streams through map-side only, so throughput is
  * the scan rate. The static side re-resolves per micro-batch by
  * Structured Streaming's stream-static contract (a benchmark-suite
  * update lands without restarting the stream); production would persist
  * the collapsed set like the batch key persists its shingle index.
  */
object StreamDecontaminate {

  /** Flag each arriving `(doc_id, text)` row against `benchSet` — a
    * 1-row static frame holding the distinct benchmark shingle array as
    * `bench_g`. Output matches [[graft.ops.Curation.decontaminate]]'s
    * schema: `(doc_id, n_shared, contaminated)` where `n_shared` counts
    * DISTINCT shared shingles (the engine side dedups via
    * `array_distinct`+`array_intersect`; the batch oracle via its
    * distinct shingle index).
    */
  def decontaminateStream(arrivals: DataFrame, benchSet: DataFrame): DataFrame = {
    val shared = size(array_intersect(col("shingles"), col("bench_g")))
    Dedup.shingleArray(arrivals)
      .crossJoin(broadcast(benchSet))
      .select(col("doc_id"),
        shared.cast("long").as("n_shared"),
        (shared > 0).cast("int").as("contaminated"))
  }
}
