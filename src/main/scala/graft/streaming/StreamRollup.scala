package graft.streaming

import graft.model.AggregationMethod
import graft.ops.{Buckets, Ingest, Rollup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous rollup — the streaming form of whisper's signature
  * `propagate` cascade (reference: whisper.go `propagate`; SURVEY.md
  * §2.5). Whisper propagates EVERY write down the archive list
  * immediately; the batch keys (`rollup_cascade_5m`/`_1h`) re-derive
  * levels wholesale instead. This operator is the middle ground a
  * streaming deployment runs: each micro-batch merges into the fine
  * level (batch U2 LWW — shared implementation, semantics cannot
  * drift) and re-derives ONLY the coarse buckets the batch touched,
  * carrying every untouched coarse row forward verbatim.
  *
  * The final coarse level is therefore EXACTLY the batch cascade of
  * everything ever streamed — the `stream_rollup` oracle key pins that
  * equality against the same DuckDB SQL as `rollup_cascade_5m`.
  *
  * Scale: per batch, the fine merge is the bounded-shuffle batch-U2
  * hash aggregation; the re-derivation input is the fine rows under
  * the touched coarse buckets (a broadcast semi join — the touched set
  * is bounded by batch volume, not retention depth), and the coarse
  * carry-forward is a broadcast anti join. Nothing scans the full
  * retention window after the batch that wrote it. In production the
  * two states are partitioned tables with per-partition overwrite
  * (SURVEY.md §7.4 note 5); here they are the same driver-checkpointed
  * frames the proven [[StreamIngest.LwwStore]] uses.
  */
object StreamRollup {

  /** Cross-batch state: the fine LWW level plus the incrementally
    * maintained coarse level of one cascade step
    * (`spp` → `coarseSpp`, consolidated by `method` under `xff`).
    */
  final class CascadeStore(spp: Int, coarseSpp: Int,
      method: AggregationMethod, xff: Double) extends Serializable {
    require(coarseSpp % spp == 0 && coarseSpp > spp,
      s"coarse step $coarseSpp must be a multiple of the fine step $spp")

    /** (metric, bucket_ts, value, ts_s) — raw-ts winners, so LWW
      * displacement stays order-insensitive across micro-batches. */
    @volatile private var fine: Option[DataFrame] = None

    /** (metric, bucket_ts, value, known, total) — whisper's coarse
      * archive rows with quality metadata. */
    @volatile private var coarse: Option[DataFrame] = None

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      val pts = batch.select(col("metric"), col("ts_s"), col("value"))
      // fine level: re-dedup (previous winners ∪ batch) on raw ts —
      // the exact batch U2 rule, as LwwStore
      val mergedFine = fine match {
        case None => Ingest.lwwAlignKeepTs(pts, spp)
        case Some(prev) => Ingest.lwwAlignKeepTs(
          prev.select(col("metric"), col("ts_s"), col("value"))
            .unionAll(pts), spp)
      }
      val fineCk = mergedFine.localCheckpoint(true)
      fine = Some(fineCk)
      // whisper's propagate scope: the coarse buckets THIS batch wrote
      val touched = pts.select(col("metric"),
        Buckets.alignTs(col("ts_s"), coarseSpp).as("bucket_ts")).distinct()
      val fineTouched = fineCk
        .withColumn("ct", Buckets.alignTs(col("bucket_ts"), coarseSpp))
        .join(broadcast(touched.withColumnRenamed("bucket_ts", "ct")),
          Seq("metric", "ct"), "left_semi")
      val rederived = Rollup.propagate(
        fineTouched.select(col("metric"), col("bucket_ts"), col("value")),
        spp, coarseSpp, method, xff)
      // carry untouched coarse rows forward; touched ones are replaced
      // by their re-derivation (or dropped, if they newly fail the
      // xff gate — re-derivation semantics, same as the batch key)
      val mergedCoarse = coarse match {
        case None => rederived
        case Some(prev) =>
          prev.join(broadcast(touched), Seq("metric", "bucket_ts"),
              "left_anti")
            .unionByName(rederived)
      }
      coarse = Some(mergedCoarse.localCheckpoint(true))
    }

    /** The coarse level so far: (metric, bucket_ts, value, known,
      * total). Equals the batch cascade over everything streamed. */
    def currentCoarse: Option[DataFrame] = coarse
  }
}
