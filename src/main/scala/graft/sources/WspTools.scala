package graft.sources

import graft.model.WhisperSchema
import graft.ops.{Buckets, Rollup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tree-level maintenance operations mirroring the PUBLIC whisper
  * toolchain that every graphite operator runs alongside the reference
  * library (`whisper-fill.py`, `whisper-resize.py` in
  * graphite-project/whisper — companion tools of the format, documented
  * semantics, no reference code involved) — re-expressed as distributed
  * Spark jobs over the [[WspDataSource]] / [[WspWrite]] pair. These are
  * the "day 2" operations a migrating go-whisper user needs: backfill a
  * gappy tree from an archive copy, and re-derive a tree under a new
  * retention config.
  *
  * Scale shape: both are relational plans over the wsp source (file
  * pruning + bin-packed scans), one shuffle keyed by (metric, bucket) or
  * metric, and an executor-parallel per-metric write — no driver-side
  * file loop, unlike the single-threaded python tools.
  */
object WspTools {

  /** `whisper-fill` semantics: copy into `dstDir` every point of
    * `srcDir` whose ring slot in dst is EMPTY or holds a STALER (older
    * interval) point — current dst data always wins, src fills gaps.
    * Level-aligned by archive index. Returns the per-metric merge
    * manifest (the write has run on return).
    *
    * The gap test is keyed by RING SLOT CLASS (`(ts div spp) mod
    * points`) with an interval comparison, not raw timestamp equality:
    *  - a src point from an older ring lap lands in the SAME slot as a
    *    newer occupied dst point — a ts-keyed check would call it a gap
    *    and let the merge destroy dst's newer data;
    *  - conversely a dst occupant one lap STALE must not block a fresh
    *    src point — the reference tool fetches dst over the current
    *    window, where a stale-interval slot reads as a gap, and copies.
    * Slot-keyed last-interval-wins captures both directions. Rows are
    * validated against the expected geometry on the way through
    * (`raise_error` on a missing archive or an spp mismatch — the
    * src-side analog of the header check [[WspWrite.merge]] runs on dst
    * files). Shuffles are bounded by stored points, never corpus².
    */
  def fill(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      schema: WhisperSchema): DataFrame = {
    val cfg = {
      import spark.implicits._
      schema.retentions.zipWithIndex
        .map { case (r, i) => (i, r.secondsPerPoint, r.numberOfPoints) }
        .toDF("archive", "cfg_spp", "cfg_points")
    }
    def withSlot(tree: DataFrame): DataFrame =
      tree.join(broadcast(cfg), Seq("archive"), "left")
        // a LEFT join so an archive index outside the schema fails the
        // check loudly (an inner join would silently drop the level)
        .filter(when(col("cfg_spp").isNotNull &&
            col("spp") === col("cfg_spp"), lit(true)).otherwise(
          raise_error(concat(lit("fill: archive geometry mismatch — file has "),
            lit("archive="), col("archive"), lit(" spp="), col("spp"),
            lit(", schema expects spp="),
            coalesce(col("cfg_spp").cast("string"), lit("<no such archive>"))))
            .cast("boolean")))
        .withColumn("slot", expr("pmod(ts_s div cfg_spp, cfg_points)"))
    val src = withSlot(spark.read.format("wsp").load(srcDir))
    val dst = withSlot(spark.read.format("wsp").load(dstDir))
      .select(col("metric"), col("archive"), col("slot"),
        col("ts_s").as("dst_ts"))
    val gaps = src.join(dst, Seq("metric", "archive", "slot"), "left")
      .filter(col("dst_ts").isNull || col("ts_s") > col("dst_ts"))
      .select(col("metric"), col("archive"),
        col("ts_s").as("bucket_ts"), col("value"))
    WspWrite.merge(gaps, dstDir, schema)
  }

  /** `whisper-diff` semantics: every (metric, archive, ts) slot where
    * the two trees DISAGREE — present on one side only, or present on
    * both with different values. Pure relational full-outer join keyed
    * by slot, so the comparison distributes and prunes like any other
    * wsp scan (a one-metric diff opens two files). Output:
    * `(metric, archive, ts_s, value_a, value_b)` with NULL marking the
    * absent side.
    */
  def diff(
      spark: SparkSession,
      aDir: String,
      bDir: String): DataFrame = {
    val a = spark.read.format("wsp").load(aDir)
      .select(col("metric"), col("archive"), col("ts_s"),
        col("value").as("value_a"))
    val b = spark.read.format("wsp").load(bDir)
      .select(col("metric"), col("archive"), col("ts_s"),
        col("value").as("value_b"))
    a.join(b, Seq("metric", "archive", "ts_s"), "full_outer")
      .filter(col("value_a").isNull || col("value_b").isNull ||
        col("value_a") =!= col("value_b"))
  }

  /** `whisper-resize --aggregate` semantics: build a NEW tree under
    * `outDir` with `newSchema`'s retention config, each new level
    * consolidated DIRECTLY from the source tree's finest archive via the
    * target schema's aggregation method and xFilesFactor (one propagate
    * hop per level — exactly how the tool re-aggregates, and free of
    * avg-of-avg drift), clamped to the level's retention horizon at
    * `nowS`. New levels finer than the source resolution cannot be
    * invented and are refused. Returns the export manifest.
    */
  def resize(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      srcFinestSpp: Int,
      newSchema: WhisperSchema,
      nowS: Long): DataFrame = {
    val pts = spark.read.format("wsp").load(srcDir)
      .filter(col("archive") === 0)
      .select(col("metric"), col("ts_s").as("bucket_ts"), col("value"))
    val levels = newSchema.retentions.zipWithIndex.map { case (r, i) =>
      val spp = r.secondsPerPoint
      require(spp >= srcFinestSpp && spp % srcFinestSpp == 0,
        s"cannot resize ${srcFinestSpp}s data to a finer/misaligned ${spp}s archive")
      val lvl =
        if (spp == srcFinestSpp) pts
        else Rollup.propagate(pts, srcFinestSpp, spp,
            newSchema.method, newSchema.xFilesFactor)
          .select(col("metric"), col("bucket_ts"), col("value"))
      lvl.filter(col("bucket_ts") >= nowS - r.maxRetentionSeconds &&
          col("bucket_ts") < nowS)
        .withColumn("archive", lit(i))
    }
    WspWrite.export(levels.reduce(_ unionAll _), outDir, newSchema)
  }
}
