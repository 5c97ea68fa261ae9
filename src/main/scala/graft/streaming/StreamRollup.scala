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

  /** One cascade step: consolidate to `spp` seconds per point by
    * `method` under the `xff` quality gate. `retentionS`, when set,
    * applies whisper's R3 ring expiry to this level after each batch.
    */
  final case class Level(spp: Int, method: AggregationMethod, xff: Double,
      retentionS: Option[Long] = None)

  /** Cross-batch state: the fine LWW level plus the incrementally
    * maintained coarse levels of the whole cascade (each derived from
    * the level above it, exactly whisper's archive chain).
    *
    * State lifecycle: `fineRetentionS`/`Level.retentionS` bound each
    * level by whisper's R3 ring expiry against the per-batch `clock`
    * (a long-running deployment MUST set them — an unbounded fine level
    * re-checkpoints its entire history every batch); the defaults keep
    * everything, which the oracle keys rely on (their DuckDB twin
    * aggregates the full staged corpus). Superseded checkpoints are
    * unpersisted as soon as their replacement materializes.
    */
  final class CascadeStore(spp: Int, levels: Seq[Level],
      fineRetentionS: Option[Long] = None,
      clock: () => Long = () => System.currentTimeMillis() / 1000)
      extends Serializable {
    def this(spp: Int, coarseSpp: Int, method: AggregationMethod,
        xff: Double) = this(spp, Seq(Level(coarseSpp, method, xff)))
    require(levels.nonEmpty, "cascade needs at least one coarse level")
    (spp +: levels.map(_.spp)).sliding(2).foreach { case Seq(hi, lo) =>
      require(lo % hi == 0 && lo > hi,
        s"level step $lo must be a multiple of the finer step $hi")
    }

    /** (metric, bucket_ts, value, ts_s) — raw-ts winners, so LWW
      * displacement stays order-insensitive across micro-batches. */
    @volatile private var fine: Option[DataFrame] = None

    /** Per level: (metric, bucket_ts, value, known, total) — whisper's
      * archive rows with quality metadata. */
    private val states =
      scala.collection.mutable.ArrayBuffer.fill[Option[DataFrame]](
        levels.size)(None)

    private val retiredFine = new CheckpointRelease.Retired
    private val retiredLevels =
      IndexedSeq.fill(levels.size)(new CheckpointRelease.Retired)

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
      val nowS = clock()
      val keptFine = fineRetentionS.fold(mergedFine)(
        Rollup.retentionExpiry(mergedFine, _, nowS))
      val fineCk = keptFine.localCheckpoint(true)
      val prevFine = fine
      fine = Some(fineCk)
      // retire via CheckpointRelease.Retired, not Dataset.unpersist —
      // the latter is a no-op on local checkpoint blocks (RDD-persisted,
      // CacheManager-unknown); the delayed release keeps a consumer's
      // mid-stream level() snapshot scannable through this merge
      prevFine.foreach(retiredFine.supersede)
      // whisper's propagate scope cascades: the batch's touched buckets
      // at level N realign to the touched set of level N+1
      var touched = pts.select(col("metric"),
        Buckets.alignTs(col("ts_s"), levels.head.spp).as("bucket_ts"))
        .distinct()
      var src = fineCk.select(col("metric"), col("bucket_ts"), col("value"))
      var srcSpp = spp
      levels.zipWithIndex.foreach { case (lvl, i) =>
        val srcTouched = src
          .withColumn("ct", Buckets.alignTs(col("bucket_ts"), lvl.spp))
          .join(broadcast(touched.withColumnRenamed("bucket_ts", "ct")),
            Seq("metric", "ct"), "left_semi")
        val rederived = Rollup.propagate(
          srcTouched.select(col("metric"), col("bucket_ts"), col("value")),
          srcSpp, lvl.spp, lvl.method, lvl.xff)
        // carry untouched rows forward; touched ones are replaced by
        // their re-derivation (or dropped, if they newly fail the xff
        // gate — re-derivation semantics, same as the batch keys)
        val merged = states(i) match {
          case None => rederived
          case Some(prev) =>
            prev.join(broadcast(touched), Seq("metric", "bucket_ts"),
                "left_anti")
              .unionByName(rederived)
        }
        val kept = lvl.retentionS.fold(merged)(
          Rollup.retentionExpiry(merged, _, nowS))
        val ck = kept.localCheckpoint(true)
        val prevLvl = states(i)
        states(i) = Some(ck)
        prevLvl.foreach(retiredLevels(i).supersede)
        src = ck.select(col("metric"), col("bucket_ts"), col("value"))
        srcSpp = lvl.spp
        levels.lift(i + 1).foreach { next =>
          touched = touched.select(col("metric"),
            Buckets.alignTs(col("bucket_ts"), next.spp).as("bucket_ts"))
            .distinct()
        }
      }
    }

    /** A coarse level so far: (metric, bucket_ts, value, known, total).
      * Equals the batch cascade over everything streamed (minus any
      * configured expiry). Synchronized: the states buffer is written
      * on the micro-batch thread, and an unsynchronized read from a
      * monitor thread has no happens-before edge to those writes.
      */
    def level(coarseSpp: Int): Option[DataFrame] = synchronized {
      val i = levels.indexWhere(_.spp == coarseSpp)
      require(i >= 0,
        s"no cascade level at ${coarseSpp}s — levels: " +
          levels.map(_.spp).mkString(", "))
      states(i)
    }

    /** The first coarse level (single-step convenience). */
    def currentCoarse: Option[DataFrame] = synchronized { states.head }
  }
}
