package graft

import graft.model.{Retention, WhisperSchema}
import graft.ops.{Buckets, Fetch, Ingest, Rollup}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One raw input point — the public write type (reference: whisper.go →
  * `type TimeSeriesPoint struct { Time int; Value float64 }`;
  * SURVEY.md §1.1). `metric` is this engine's addition: one table holds
  * many series, where the reference is file-per-series.
  */
final case class TimeSeriesPoint(metric: String, time: Long, value: Double)

/** The user-facing facade with go-whisper's API shape — what a reference
  * user programs against after switching (SURVEY.md §1.1 table):
  *
  * {{{
  * val t = WhisperTable.create(spark, path, Retentions.std)   // Create
  * t.updateMany(points, nowS)                                 // UpdateMany
  * t.update("cpu", ts, v, nowS)                               // Update
  * val series = t.fetch("cpu", fromS, untilS, nowS)           // Fetch
  * t.maxRetention; t.aggregationMethod; t.xFilesFactor        // header
  * }}}
  *
  * Storage: one Parquet directory per archive level (`points_<spp>s`),
  * partitioned by `day` — the ring buffer becomes retention-filtered
  * re-derivation (SURVEY.md §7.5). Every write is an idempotent
  * level-by-level merge: U3 routing decides the finest archive a point
  * may land in; each level is LWW-merged with its direct writes and then
  * propagated into the next coarser level with the xFF gate, exactly
  * whisper's update→propagate cascade in batch form.
  *
  * Scale notes: each merge touches only the day-partitions present in
  * the incoming batch in a real deployment (here: whole-level overwrite
  * for simplicity — the layout supports `replaceWhere`); all merges are
  * hash aggregations on (metric, bucket); fetch prunes partitions via
  * the day directory layout and row-group stats.
  */
final class WhisperTable private (
    spark: SparkSession,
    val path: String,
    val schema: WhisperSchema) {

  // ---- S4 header introspection (reference: Size/MaxRetention/... ) ----
  def aggregationMethod: graft.model.AggregationMethod = schema.method
  def xFilesFactor: Double = schema.xFilesFactor
  def retentions: Seq[Retention] = schema.retentions
  def maxRetention: Long = schema.maxRetentionSeconds

  private def levelPath(r: Retention) = s"$path/points_${r.secondsPerPoint}s"

  private def readLevel(r: Retention): DataFrame = {
    val p = levelPath(r)
    try {
      val df = spark.read.parquet(p)
      df.select(col("metric"), col("bucket_ts"), col("value"))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => emptyLevel
    }
  }

  private def emptyLevel: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Double)].toDF("metric", "bucket_ts", "value")
  }

  private def writeLevel(r: Retention, df: DataFrame): Unit =
    df.select(col("metric"), col("bucket_ts"), col("value"))
      .withColumn("day", to_date(timestamp_seconds(col("bucket_ts"))))
      .write.mode("overwrite").partitionBy("day").parquet(levelPath(r))

  /** U1 `Update`: single-point write (delegates to the batch path, as the
    * reference's Update shares alignPoints/propagate with UpdateMany).
    */
  def update(metric: String, time: Long, value: Double, nowS: Long): Unit = {
    import spark.implicits._
    updateMany(Seq(TimeSeriesPoint(metric, time, value)).toDS(), nowS)
  }

  /** U2/U3 `UpdateMany`: batch upsert with archive routing, LWW alignment,
    * and the full propagation cascade.
    */
  def updateMany(points: Dataset[TimeSeriesPoint], nowS: Long): Unit = {
    val pts = points.toDF()
      .select(col("metric"), col("time").as("ts_s"), col("value"))
      .withColumn("archive", Ingest.archiveColumn(schema, nowS))
      .filter(col("archive") > 0) // F3: silently drop out-of-retention here
      .localCheckpoint(true)      // routing reused by every level below
    // walk finest→coarsest: each level = LWW(existing ∪ propagated-from-
    // finer ∪ direct writes routed here), then retention-expired
    var propagated: Option[DataFrame] = None
    var prevSpp = 0
    for ((r, i) <- schema.retentions.zipWithIndex) {
      val spp = r.secondsPerPoint
      val direct = Ingest.lwwAlign(
        pts.filter(col("archive") === i + 1).drop("archive"), spp)
      val existing = readLevel(r)
      // whisper write order in one update cycle: direct slot write, then
      // propagation overwrites — so propagated values win on conflict,
      // then direct, then prior content (max_by on a priority column)
      val merged = Seq(
        existing.withColumn("prio", lit(0)),
        direct.withColumn("prio", lit(1)),
        propagated.getOrElse(emptyLevel).withColumn("prio", lit(2)))
        .reduce(_ unionAll _)
        .groupBy("metric", "bucket_ts")
        .agg(max_by(col("value"), col("prio")).as("value"))
      val expired = Rollup.retentionExpiry(merged, r.maxRetentionSeconds, nowS)
        .localCheckpoint(true) // read below AND written over its own input
      writeLevel(r, expired)
      // R1/R2: derive the next coarser level's candidate buckets from
      // this level's full content (batch re-derivation — equivalent end
      // state to whisper's per-bucket cascade, SURVEY.md §2.5 R2)
      schema.retentions.lift(i + 1).foreach { next =>
        propagated = Some(
          Rollup.propagate(expired, spp, next.secondsPerPoint,
              schema.method, schema.xFilesFactor)
            .select(col("metric"), col("bucket_ts"), col("value")))
      }
      prevSpp = spp
    }
  }

  /** Q1 `Fetch`: clamp the range, select the finest archive covering it,
    * return the dense fixed-step series with NULL gaps.
    */
  def fetch(metric: String, fromS: Long, untilS: Long, nowS: Long): DataFrame = {
    require(fromS <= untilS, "invalid time interval")
    val from = math.max(fromS, nowS - maxRetention) // F1 clamp
    val until = math.min(untilS, nowS)
    val archive = Fetch.selectArchive(schema, nowS, from)
    val spp = archive.secondsPerPoint
    val fromI = Buckets.fetchInterval(from, spp)
    val untilI = Buckets.fetchInterval(until, spp)
    val spine = spark.range(fromI, untilI, spp.toLong).toDF("bucket_ts")
    val agg = readLevel(archive)
      .filter(col("metric") === metric &&
        col("bucket_ts") >= fromI && col("bucket_ts") < untilI)
      .select(col("bucket_ts"), col("value"))
    spine.join(agg, Seq("bucket_ts"), "left")
      .select(col("bucket_ts"), col("value"))
      .orderBy("bucket_ts")
  }
}

object WhisperTable {

  /** S2 `Create`: validate the schema (constructor runs the 5 rules) and
    * initialize every archive level empty. Fails if the table exists
    * (reference: O_CREAT|O_EXCL, "file already exists").
    */
  def create(spark: SparkSession, path: String, schema: WhisperSchema): WhisperTable = {
    val dir = new java.io.File(path)
    if (dir.exists()) throw new IllegalStateException(s"file already exists: $path")
    val t = new WhisperTable(spark, path, schema)
    import spark.implicits._
    schema.retentions.foreach { r =>
      t.writeLevel(r, Seq.empty[(String, Long, Double)]
        .toDF("metric", "bucket_ts", "value"))
    }
    t
  }

  /** S1 `Open`: attach to an existing table. The header lives in the
    * caller-supplied schema (Parquet carries physical metadata itself;
    * SURVEY.md §1.1 — no binary header to parse).
    */
  def open(spark: SparkSession, path: String, schema: WhisperSchema): WhisperTable = {
    if (!new java.io.File(path).exists())
      throw new IllegalStateException(s"no such table: $path")
    new WhisperTable(spark, path, schema)
  }
}
