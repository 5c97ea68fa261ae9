package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming HyperLogLog — the MERGEABILITY demonstration of the sketch
  * family: HLL registers fold with `max`, which is associative,
  * commutative and idempotent, so per-micro-batch register maxima merged
  * into a running register state land EXACTLY where the batch sketch
  * over everything streamed lands — independent of arrival order, batch
  * boundaries, or re-delivery. That property (not any state machinery)
  * is why HLL is the streaming cardinality primitive; `stream_sketch`
  * pins it by sharing the batch `sketch_hll` oracle.
  *
  * State is 2^[[Dedup.HllIndexBits]] register rows — constant-size
  * regardless of stream volume, the smallest state of any key in the
  * streaming family (compare StreamDedup's per-hash entry). At 100 TB:
  * each batch contributes one linear pass + a 256-row fold; the running
  * registers are a table any consumer can snapshot for an estimate
  * mid-stream.
  */
object StreamSketch {

  /** Cross-batch register state, merged max-wise per micro-batch (the
    * driver-checkpointed-frame pattern of [[StreamIngest.LwwStore]] /
    * [[StreamRollup.CascadeStore]]).
    */
  final class RegisterStore extends Serializable {

    @volatile private var regs: Option[DataFrame] = None

    /** Fold one micro-batch of `(doc_id, text)` arrivals into the
      * registers: per-doc shingle arrays (stateless, the
      * stream-decontaminate derivation), exploded to shingles, hashed
      * and ranked by the SAME [[Dedup.hllRho]] stage the batch sketch
      * uses, then max-merged into the running registers.
      */
    def mergeBatch(docs: DataFrame, batchId: Long): Unit = synchronized {
      val g = Dedup.shingleArray(docs)
        .select(explode(col("shingles")).as("g"))
      val batchRegs = Dedup.hllRho(g)
        .groupBy("bucket").agg(max(col("rho")).as("m"))
      val merged = regs match {
        case None => batchRegs
        case Some(prev) => prev.unionByName(batchRegs)
          .groupBy("bucket").agg(max(col("m")).as("m"))
      }
      val ck = merged.localCheckpoint(true)
      val prev = regs
      regs = Some(ck)
      // retire the superseded (constant-size, but still one per batch)
      // register generation — released one batch LATER so a mid-stream
      // snapshot stays scannable (see CheckpointRelease.Retired)
      prev.foreach(retired.supersede)
    }

    private val retired = new CheckpointRelease.Retired

    /** Registers so far: `(bucket, m)`. */
    def current: Option[DataFrame] = regs
  }

  /** Cross-batch Count-Min counter state — the SUM-merge twin of
    * [[RegisterStore]]'s max-merge: CMS counters over a batch union are
    * the per-batch counters ADDED (counting is linear), so the streamed
    * counter table equals the batch build exactly, in any arrival
    * order. Together the two stores demonstrate both mergeable-sketch
    * algebras; state is the constant-size counter table either way.
    */
  final class CounterStore extends Serializable {

    @volatile private var counters: Option[DataFrame] = None
    private var lastBatchId = -1L

    def mergeBatch(docs: DataFrame, batchId: Long): Unit = synchronized {
      // foreachBatch is at-least-once and SUM-merge is NOT idempotent
      // (unlike RegisterStore's max): a re-delivered batch must be
      // skipped or its counts double. The batchId guard is exactly the
      // dedup Spark documents for non-idempotent foreachBatch sinks.
      if (batchId <= lastBatchId) return
      val b = Dedup.cmsCounters(docs)
      val merged = counters match {
        case None => b
        case Some(prev) => prev.unionByName(b)
          .groupBy("r", "c").agg(sum(col("n")).as("n"))
      }
      val ck = merged.localCheckpoint(true)
      val prev = counters
      counters = Some(ck)
      // record the id ONLY after the merge materialized (Spark's
      // documented order: process, then mark). The r14 review caught
      // the inverted form: marking first meant a batch whose
      // checkpoint THREW was skipped on its at-least-once retry and
      // its counts were lost forever.
      lastBatchId = batchId
      prev.foreach(retired.supersede)
    }

    private val retired = new CheckpointRelease.Retired

    /** Counters so far: `(r, c, n)`. */
    def current: Option[DataFrame] = counters
  }
}
