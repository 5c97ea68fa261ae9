package graft.streaming

import graft.ops.{Buckets, CoreQueries, Curation, Dedup, PipelineOps, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Oracle-checked STREAMING query keys — the [[graft.sources.WspQueries
  * .wspStreamIngest]] pattern (stream → state → relational scan-back vs
  * a batch oracle) applied across the streaming surface: the stateful
  * state machines ([[StreamDedup]], [[StreamSessionize]],
  * [[StreamRollup]]'s continuous cascade, [[StreamAsof]]'s scalar
  * carry, the windowed agg), the mergeable-sketch folds
  * ([[StreamSketch]]'s HLL max-merge and CMS sum-merge), and the
  * stateless stream-static broadcast gates ([[StreamDecontaminate]],
  * [[StreamSrpProbe]], [[StreamDsir]]). Per-key specs pin streaming ≡
  * batch in-JVM; these keys pin the same equivalence against the
  * external DuckDB oracle, which knows nothing about micro-batches: a
  * hash match proves the streamed state machine computes exactly the
  * relational answer.
  *
  * Every fixture stages its input as parquet and runs Trigger
  * .AvailableNow queries over a file stream with a shared checkpoint, so
  * batch boundaries are DETERMINISTIC (a later query only sees files
  * staged after the earlier ran; mtime staggering orders waves within a
  * run) — cross-batch state handoffs are exercised by construction, not
  * by scheduler luck.
  */
object StreamQueries {

  // ------------------------------------------------ shared staged fixtures
  //
  // Every wave harness used to re-derive and re-write its own staged
  // copy of the corpus — at sf0.1 that is ~2-3 s of identical Spark
  // work per harness, the dominant share of the streaming keys' cold
  // bench cost. The two frames every harness stages (time-split event
  // points, id-split documents) are now built ONCE per (dir, input
  // digest) under the shared index root and COPIED file-wise into each
  // harness's private stage directory — a filesystem copy, no Spark
  // job. Copies get explicit ascending mtimes so the file stream's
  // timestamp ordering (which decides batch order under
  // maxFilesPerTrigger) can never tie at clock granularity.

  /** Session clone for the harnesses' short-lived streaming runs, with
    * micro-batch shuffle / state-store width 4 instead of the caller's
    * 32. Each AvailableNow query here lives a few seconds over a few
    * staged single-digit-MB files, but at width 32 every one of its
    * micro-batches pays 32 state-store providers' open/commit/snapshot
    * churn and 32-task shuffles for state that fits in one — measured
    * as the dominant share of the streaming keys' cold bench cost
    * (~45 s/round at r11). Results are width-independent by
    * construction: every streamed state machine is key-local, the
    * consolidation sums are exact fixed-point ([[graft.ops.Rollup]]),
    * and PartitionVarianceSpec pins the float-bearing keys across
    * layouts. The width is baked into each checkpoint at first run and
    * every run in a JVM shares the memoized checkpoint, so it stays
    * consistent per fixture.
    */
  private[graft] def narrowSession(s: SparkSession): SparkSession = {
    val ns = s.newSession()
    ns.conf.set("spark.sql.shuffle.partitions", "4")
    ns
  }

  /** Copy the part files of `src` into `dst` with an explicit mtime:
    * all copied files get `mtimeMs`, which callers stagger per wave so
    * wave N always sorts before wave N+1 in the file source.
    */
  private def copyParts(src: String, dst: String, mtimeMs: Long): Unit = {
    val d = new java.io.File(dst)
    d.mkdirs()
    val parts = Option(new java.io.File(src).listFiles()).getOrElse(Array())
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // fail LOUDLY on a missing/emptied fixture (a /tmp sweeper, a stale
    // prune): silently copying zero files would surface only as an
    // inscrutable empty-result oracle mismatch far from the cause (r14
    // review)
    require(parts.nonEmpty, s"stage fixture has no part files: $src")
    parts.foreach { f =>
      val out = new java.io.File(d, f.getName)
      java.nio.file.Files.copy(f.toPath, out.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      out.setLastModified(mtimeMs)
      ()
    }
  }

  /** Stage the two corpus waves (mtime-ordered so wave 1's batch runs
    * first) plus TWO far-future [[Sentinel]] flush files — the shared
    * prefix of the sessionize and windowed-agg harnesses. Append-mode
    * finalization uses batch N−1's watermark, so sentinel 1 advances
    * the watermark computation and sentinel 2's batch flushes every
    * real session/bucket; one definition so the flush machinery (mtime
    * offsets, sentinel spacing) cannot drift between the two keys.
    */
  private def stageWavesWithSentinels(
      s: SparkSession, fixture: String, stage: String): Unit = {
    import s.implicits._
    val t0 = System.currentTimeMillis()
    copyParts(s"$fixture/w1", stage, t0 - 6000)
    copyParts(s"$fixture/w2", stage, t0 - 4000)
    Seq((Sentinel, Buckets.NowS + 10 * 86400L, 0.0),
        (Sentinel, Buckets.NowS + 20 * 86400L, 0.0))
      .foreach { row =>
        Seq(row).toDF("metric", "ts_s", "value")
          .coalesce(1).write.mode("append").parquet(stage)
      }
  }

  /** Staged event points `(event_id, metric, ts_s, value)` split at the
    * time-range midpoint into `w1`/`w2` — one build serves the rollup,
    * as-of, windowed-agg and sessionize harnesses (each declares the
    * column subset it streams; parquet projects by name).
    */
  private def pointsWaveFixture(s: SparkSession, dir: String): String =
    Dedup.sharedIndexPath(s, dir, "events.parquet", "stage_pts") { base =>
      import s.implicits._
      val pts = Buckets.eventsRaw(s, dir)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type").as("metric"), col("ts_s"), col("value"))
      val (lo, hi) = pts.agg(min("ts_s"), max("ts_s")).as[(Long, Long)].head()
      val mid = lo + (hi - lo) / 2
      pts.filter(col("ts_s") <= mid)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/w1")
      pts.filter(col("ts_s") > mid)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/w2")
    }

  /** Staged documents `(doc_id, text)` split at the id midpoint into
    * `w1`/`w2` — one build serves both mergeable-sketch harnesses.
    */
  private def docsWaveFixture(s: SparkSession, dir: String): String =
    Dedup.sharedIndexPath(s, dir, "documents.parquet", "stage_docs") { base =>
      import s.implicits._
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val (lo, hi) = corpus.agg(min("doc_id"), max("doc_id"))
        .as[(Long, Long)].head()
      val mid = lo + (hi - lo) / 2
      corpus.filter(col("doc_id") <= mid)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/w1")
      corpus.filter(col("doc_id") > mid)
        .coalesce(1).write.mode("overwrite").parquet(s"$base/w2")
    }

  /** `stream_dedup` — [[StreamDedup.dedupStream]] driven over the
    * documents corpus in two deterministic arrival waves split by doc_id
    * at the id range's midpoint: wave 2 re-delivers content whose hash
    * was first seen (and state-committed) in wave 1, so `is_first=false`
    * decisions cross a real checkpoint restart. Because waves are
    * id-ordered, the first wave containing a hash also contains its
    * global min doc_id, which makes the streamed canonical exactly the
    * batch rule's min — the property the oracle checks per row.
    */
  private def ensureStreamDeduped(s: SparkSession, dir: String): String =
    Dedup.sharedIndexPath(s, dir, "documents.parquet", "stream_dedup") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"),
          md5(col("text")).as("text_hash"))
      val (lo, hi) = docs.agg(min("doc_id"), max("doc_id"))
        .as[(Long, Long)].head()
      val mid = lo + (hi - lo) / 2
      def runWave(wave: DataFrame): Unit = {
        wave.coalesce(1).write.mode("append").parquet(stage)
        val arrivals = narrowSession(s).readStream.schema(docs.schema).parquet(stage)
          .as[StreamDedup.DocArrival]
        StreamDedup.dedupStream(arrivals).toDF()
          .writeStream.outputMode("append")
          .format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      runWave(docs.filter(col("doc_id") <= mid))
      runWave(docs.filter(col("doc_id") > mid))
    }

  def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamDeduped(s, dir)
    s.read.parquet(s"$base/out")
      .select(col("doc_id"), col("text_hash"), col("is_first"),
        col("canonical_id"))
      .orderBy("doc_id")
  }

  val streamDedupSql: String =
    """SELECT doc_id,
      |       md5(text) AS text_hash,
      |       doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_first,
      |       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Throwaway metric whose far-future events exist only to advance the
    * event-time watermark past every real session's end; it never
    * finalizes itself (no later batch passes ITS end) and is filtered
    * from the result regardless.
    */
  private val Sentinel = "zz_watermark_sentinel"

  /** `stream_sessionize` — [[StreamSessionize.sessionizeStream]] over
    * the staged event stream. Append-mode session finalization needs the
    * watermark to PASS a session's end, and the watermark used by batch
    * N is computed from batch N−1 — so the run feeds two sentinel files
    * one batch apart (`maxFilesPerTrigger=1`): the first advances the
    * watermark computation, the second's batch runs with that advanced
    * watermark and flushes every real session. The corpus arrives as
    * the two TIME-ordered staged waves (session state spans their batch
    * boundary in-run), so no real event is ever late.
    */
  private def ensureStreamSessionized(s: SparkSession, dir: String): String = {
    val fixture = pointsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "events.parquet", "stream_sessionize") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val pts = Buckets.points(s, dir)
      // one AvailableNow run over mtime-ordered corpus waves + the two
      // sentinel flush files — the shared stageWavesWithSentinels shape;
      // session state spans the wave batches inside the run, and the
      // time-ordered waves mean no real event is ever late
      stageWavesWithSentinels(s, fixture, stage)
      StreamSessionize
        .sessionizeStream(
          narrowSession(s).readStream.schema(pts.schema).option("maxFilesPerTrigger", 1)
            .parquet(stage), PipelineOps.SessionGapS, "1 hour")
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
  }

  def streamSessionize(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamSessionized(s, dir)
    s.read.parquet(s"$base/out")
      .filter(col("metric") =!= Sentinel)
      .select(col("metric"), col("session_start"), col("n_events"),
        col("duration_s"))
      .orderBy("metric", "session_start")
  }

  /** `stream_rollup` — [[StreamRollup.CascadeStore]] driven over the
    * event stream in two deterministic arrival waves split at the
    * event-time midpoint: 5-minute buckets straddling the split receive
    * points in BOTH waves, so their re-derivation crosses a real batch
    * boundary (wave 2 must replace wave 1's coarse rows for exactly
    * those buckets and carry every other row forward untouched). The
    * final coarse level must equal the batch cascade — the oracle IS
    * `rollup_cascade_5m`'s SQL.
    */
  private def ensureStreamRollup(s: SparkSession, dir: String): String = {
    val fixture = pointsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "events.parquet", "stream_rollup") { base =>
      val stage = s"$base/stage"
      val pts = Buckets.points(s, dir)
      val store = new StreamRollup.CascadeStore(60, Seq(
        StreamRollup.Level(300, graft.model.AggregationMethod.Sum, 0.0),
        StreamRollup.Level(3600, graft.model.AggregationMethod.Sum, 0.0)))
      def runWave(wave: String, mtimeMs: Long): Unit = {
        copyParts(s"$fixture/$wave", stage, mtimeMs)
        narrowSession(s).readStream.schema(pts.schema).parquet(stage)
          .writeStream.outputMode("update")
          .foreachBatch { (b: DataFrame, id: Long) => store.mergeBatch(b, id) }
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val t0 = System.currentTimeMillis()
      runWave("w1", t0 - 4000)
      runWave("w2", t0 - 2000)
      Seq(300, 3600).foreach { lvl =>
        store.level(lvl).get
          .select(col("metric"), col("bucket_ts"),
            round(col("value"), 6).as("value"), col("known"), col("total"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/out$lvl")
      }
    }
  }

  def streamRollup(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamRollup(s, dir)
    s.read.parquet(s"$base/out300").orderBy("metric", "bucket_ts")
  }

  /** `stream_rollup_1h` — level 3 of the SAME streamed cascade (one
    * shared build); oracle = `rollup_cascade_1h`'s SQL verbatim.
    */
  def streamRollup1h(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamRollup(s, dir)
    s.read.parquet(s"$base/out3600").orderBy("metric", "bucket_ts")
  }

  /** `stream_fetch_agg` — [[StreamIngest.windowedAgg]], the pure
    * Structured Streaming consolidation path (tumbling event-time
    * windows + watermark, APPEND mode: a bucket emits exactly once,
    * when the watermark passes it), under the external oracle. Append
    * finalization needs the watermark to move past every real bucket —
    * the same two-sentinel flush as `stream_sessionize`.
    */
  private def ensureStreamFetchAgg(s: SparkSession, dir: String): String = {
    val fixture = pointsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "events.parquet", "stream_fetch_agg") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val pts = Buckets.points(s, dir)
      // ONE AvailableNow run, `maxFilesPerTrigger=1`, over the staged
      // corpus waves plus the two sentinel files — the shared
      // stageWavesWithSentinels shape (the r10 two-query form's second
      // start, a full checkpoint restart at ~1.5 s of fixed harness
      // cost, bought only the restart exercise, which StreamSpec pins
      // separately).
      stageWavesWithSentinels(s, fixture, stage)
      StreamIngest.windowedAgg(
          narrowSession(s).readStream.schema(pts.schema).option("maxFilesPerTrigger", 1)
            .parquet(stage), 60, "1 hour")
        .writeStream.outputMode("append")
        .format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
    }
  }

  def streamFetchAgg(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamFetchAgg(s, dir)
    s.read.parquet(s"$base/out")
      .filter(col("metric") =!= Sentinel)
      .select(col("metric"), col("bucket_ts"),
        Buckets.round6(col("value")).as("value"), col("known"))
      .orderBy("metric", "bucket_ts")
  }

  // bucket mean as the exact fixed-point sum (the Rollup.fixedSum pin,
  // the same arithmetic the streaming side's windowedAgg consolidation
  // uses) — order-independent across arrival waves AND engines — and
  // rounded through the SHARED pinned formula (Buckets.round6): the
  // identical pre-round double would still split across the two engines'
  // NATIVE rounds at a decimal midpoint (Spark HALF_UP on the decimal
  // expansion vs DuckDB scale-first — the 1391.13/32 case in round6's doc)
  val streamFetchAggSql: String =
    s"""SELECT event_type AS metric,
      |       (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 60) * 60
      |         AS bucket_ts,
      |       ${Buckets.round6Sql(graft.ops.Rollup.fixedSumSql() +
               " / count(value)")} AS value,
      |       count(*) AS known
      |FROM events GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** `stream_asof` — [[StreamAsof.asofStream]] driven over the events
    * stream in two deterministic arrival waves split by ts at the time
    * range's midpoint: every metric's carry state (its last observation)
    * crosses a real checkpoint restart between the waves, and because
    * waves respect event time, the streamed enrichment must equal the
    * batch `lag` window over `(metric ORDER BY ts_s, event_id)` — which
    * is exactly what the oracle computes.
    */
  private def ensureStreamAsof(s: SparkSession, dir: String): String = {
    val fixture = pointsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "events.parquet", "stream_asof") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val pts = Buckets.eventsRaw(s, dir)
        .select(col("event_id").cast("long").as("event_id"),
          col("event_type").as("metric"), col("ts_s"), col("value"))
      def runWave(wave: String, mtimeMs: Long): Unit = {
        copyParts(s"$fixture/$wave", stage, mtimeMs)
        val arrivals = narrowSession(s).readStream.schema(pts.schema).parquet(stage)
          .as[StreamAsof.PointArrival]
        StreamAsof.asofStream(arrivals).toDF()
          .writeStream.outputMode("append")
          .format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val t0 = System.currentTimeMillis()
      runWave("w1", t0 - 4000)
      runWave("w2", t0 - 2000)
    }
  }

  def streamAsof(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamAsof(s, dir)
    s.read.parquet(s"$base/out")
      .select(col("event_id"), col("metric"), col("ts_s"), col("value"),
        col("prev_ts"), col("prev_value"), col("gap_s"))
      .orderBy("event_id")
  }

  val streamAsofSql: String =
    """WITH pe AS (
      |  SELECT event_id, event_type AS metric,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s,
      |         value
      |  FROM events)
      |SELECT event_id, metric, ts_s, value,
      |       lag(ts_s) OVER w AS prev_ts,
      |       lag(value) OVER w AS prev_value,
      |       ts_s - lag(ts_s) OVER w AS gap_s
      |FROM pe
      |WINDOW w AS (PARTITION BY metric ORDER BY ts_s, event_id)
      |ORDER BY event_id""".stripMargin

  /** `stream_decontaminate` — [[StreamDecontaminate.decontaminateStream]]
    * over the corpus staged in two doc_id waves. The static side (the
    * distinct benchmark shingle set collapsed to one sorted array row)
    * is built from the SAME shared shingle index the batch key uses, so
    * the stream and batch gates can never disagree on the shingle rule.
    * Stateless by design — the waves prove multi-batch planning of the
    * stream-static join, not a state handoff (there is none to prove).
    */
  private def ensureStreamDecontaminated(s: SparkSession, dir: String): String =
    Dedup.sharedIndexPath(s, dir, "documents.parquet", "stream_decon") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") >= Curation.BenchmarkDocs)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val bench = Dedup.shingleSetShared(s, dir)
        .filter(col("doc_id") < Curation.BenchmarkDocs)
        .agg(sort_array(collect_set(col("g"))).as("bench_g"))
      val (lo, hi) = corpus.agg(min("doc_id"), max("doc_id"))
        .as[(Long, Long)].head()
      val mid = lo + (hi - lo) / 2
      def runWave(wave: DataFrame): Unit = {
        wave.coalesce(1).write.mode("append").parquet(stage)
        val arrivals = narrowSession(s).readStream.schema(corpus.schema).parquet(stage)
        StreamDecontaminate.decontaminateStream(arrivals, bench)
          .writeStream.outputMode("append")
          .format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      runWave(corpus.filter(col("doc_id") <= mid))
      runWave(corpus.filter(col("doc_id") > mid))
    }

  def streamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamDecontaminated(s, dir)
    s.read.parquet(s"$base/out")
      .select(col("doc_id"), col("n_shared"), col("contaminated"))
      .orderBy("doc_id")
  }

  /** `stream_srp_probe` — [[StreamSrpProbe.probeStream]] over the
    * odd-id embeddings staged in two vec_id waves, probed against the
    * SAME persisted signature index the batch ANN keys serve from (so
    * stream and batch can never band differently). Stateless like the
    * decontamination gate: the waves prove multi-batch planning of the
    * band-bucket stream-static joins, not a state handoff.
    */
  private def ensureStreamSrpProbe(s: SparkSession, dir: String): String =
    Dedup.sharedIndexPath(s, dir, "embeddings.parquet", "stream_srp") { base =>
      import s.implicits._
      val stage = s"$base/stage"
      val buckets = StreamSrpProbe.bucketTables(Similarity.srpIndexShared(s, dir))
      val arrivals0 = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      val (lo, hi) = arrivals0.agg(min("vec_id"), max("vec_id"))
        .as[(Long, Long)].head()
      val mid = lo + (hi - lo) / 2
      def runWave(wave: DataFrame): Unit = {
        wave.coalesce(1).write.mode("append").parquet(stage)
        val arrivals = narrowSession(s).readStream.schema(arrivals0.schema).parquet(stage)
        StreamSrpProbe.probeStream(arrivals, buckets)
          .writeStream.outputMode("append")
          .format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      runWave(arrivals0.filter(col("vec_id") <= mid))
      runWave(arrivals0.filter(col("vec_id") > mid))
    }

  def streamSrpProbe(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamSrpProbe(s, dir)
    s.read.parquet(s"$base/out")
      .select(col("vec_id"), col("n_mates"), col("has_mate"))
      .orderBy("vec_id")
  }

  /** Oracle: the shared SRP band CTEs, then per odd-id vector the
    * distinct index members sharing ≥1 band bucket (self excluded —
    * arrivals are index members, so n_all always counts them once).
    */
  val streamSrpProbeSql: String =
    s"""WITH ${Similarity.srpBandsCtes},
       |mates AS (
       |  SELECT q.vec_id, count(DISTINCT c.vec_id) AS n_all
       |  FROM bands q
       |  JOIN bands c ON c.band_id = q.band_id AND c.band_key = q.band_key
       |  WHERE q.vec_id % 2 = 1
       |  GROUP BY q.vec_id)
       |SELECT vec_id, n_all - 1 AS n_mates,
       |       CASE WHEN n_all > 1 THEN 1 ELSE 0 END AS has_mate
       |FROM mates ORDER BY vec_id""".stripMargin

  /** Stage the documents corpus in two doc_id waves and drive `merge`
    * through an AvailableNow file stream per wave (shared checkpoint ⇒
    * deterministic batch boundaries, ids continue across waves);
    * `finish(base)` persists the folded state under the index root.
    * The ONE wave harness behind both mergeable-sketch keys — a fix to
    * the staging/checkpoint machinery lands in both by construction.
    */
  private def ensureTwoWaveFold(s: SparkSession, dir: String, name: String)(
      merge: (DataFrame, Long) => Unit)(finish: String => Unit): String = {
    val fixture = docsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "documents.parquet", name) { base =>
      val stage = s"$base/stage"
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      def runWave(wave: String, mtimeMs: Long): Unit = {
        copyParts(s"$fixture/$wave", stage, mtimeMs)
        narrowSession(s).readStream.schema(corpus.schema).parquet(stage)
          .writeStream.outputMode("append")
          .foreachBatch { (b: DataFrame, id: Long) => merge(b, id) }
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val t0 = System.currentTimeMillis()
      runWave("w1", t0 - 4000)
      runWave("w2", t0 - 2000)
      finish(base)
    }
  }

  /** `stream_sketch` — [[StreamSketch.RegisterStore]] fed the corpus in
    * two doc_id waves; the final registers must equal the batch sketch's
    * (max-merge is order-independent), so the key emits the identical
    * `(n_exact, n_est, rel_err)` row and SHARES the batch oracle. The
    * exact arm is the batch comparison side, computed from the same
    * shared shingle index the batch key reads.
    */
  private def ensureStreamSketch(s: SparkSession, dir: String): String = {
    val store = new StreamSketch.RegisterStore
    ensureTwoWaveFold(s, dir, "stream_sketch")(store.mergeBatch) { base =>
      store.current.get.write.mode("overwrite").parquet(s"$base/regs")
    }
  }

  def streamSketch(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamSketch(s, dir)
    val est = Dedup.hllEstimate(s.read.parquet(s"$base/regs"))
    val exact = Dedup.shingleSetShared(s, dir)
      .agg(countDistinct(col("g")).as("n_exact"))
    exact.crossJoin(est)
      .select(col("n_exact"), col("n_est"),
        // empty-corpus guard — keep the streamed twin pinned to the
        // batch sketchHll's NULL-on-zero rule (they share the oracle)
        round(when(col("n_exact") > 0,
          (col("n_est") - col("n_exact")) / col("n_exact")), 6)
          .as("rel_err"))
  }

  /** `stream_cms` — [[StreamSketch.CounterStore]] fed the corpus in two
    * doc_id waves; counting is linear, so the summed per-batch counters
    * equal the batch build exactly and the key emits the identical
    * top-k audit rows, SHARING the batch oracle (the sum-merge twin of
    * `stream_sketch`'s max-merge).
    */
  private def ensureStreamCms(s: SparkSession, dir: String): String = {
    val store = new StreamSketch.CounterStore
    ensureTwoWaveFold(s, dir, "stream_cms")(store.mergeBatch) { base =>
      store.current.get.write.mode("overwrite").parquet(s"$base/counters")
    }
  }

  def streamCms(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamCms(s, dir)
    Dedup.cmsServe(s, dir, s.read.parquet(s"$base/counters"))
  }

  /** `stream_dsir` — [[StreamDsir.scoreStream]] over the corpus staged
    * in two doc_id waves, scored against the SAME persisted weight
    * table the batch dsir keys serve from (collapsed to a 1-row
    * broadcast map), so stream and batch can never score under
    * different models. Stateless like the decontamination gate: the
    * waves prove multi-batch planning of the stream-static broadcast
    * and that a document's score is arrival-batch-independent — pinned
    * by SHARING the batch `dsir_weight` oracle, integer fold and all.
    */
  private def ensureStreamDsir(s: SparkSession, dir: String): String = {
    val fixture = docsWaveFixture(s, dir)
    Dedup.sharedIndexPath(s, dir, "documents.parquet", "stream_dsir") { base =>
      val stage = s"$base/stage"
      val corpus = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val model = StreamDsir.modelMap(
        Curation.dsirModel(s, dir).select(col("b"), col("wq")))
      def runWave(wave: String, mtimeMs: Long): Unit = {
        copyParts(s"$fixture/$wave", stage, mtimeMs)
        val arrivals =
          narrowSession(s).readStream.schema(corpus.schema).parquet(stage)
        StreamDsir.scoreStream(arrivals, model)
          .writeStream.outputMode("append")
          .format("parquet").option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
      val t0 = System.currentTimeMillis()
      runWave("w1", t0 - 4000)
      runWave("w2", t0 - 2000)
    }
  }

  def streamDsir(s: SparkSession, dir: String): DataFrame = {
    val base = ensureStreamDsir(s, dir)
    s.read.parquet(s"$base/out")
      .select(col("doc_id"), col("n_tokens"), col("dsir_weight"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_dsir" -> (streamDsir _),
    "stream_cms" -> (streamCms _),
    "stream_sketch" -> (streamSketch _),
    "stream_decontaminate" -> (streamDecontaminate _),
    "stream_srp_probe" -> (streamSrpProbe _),
    "stream_dedup" -> (streamDedup _),
    "stream_sessionize" -> (streamSessionize _),
    "stream_rollup" -> (streamRollup _),
    "stream_rollup_1h" -> (streamRollup1h _),
    "stream_fetch_agg" -> (streamFetchAgg _),
    "stream_asof" -> (streamAsof _))

  val oracleSql: Map[String, String] = Map(
    // stateless stream-static scoring ≡ the batch serve fold — the
    // stream key shares dsir_weight's oracle, exact integers and all
    "stream_dsir" -> Curation.dsirWeightSql,
    // register max-merge is order-independent ≡ the batch sketch — same oracle
    "stream_sketch" -> Dedup.sketchHllSql,
    // counter sum-merge is linear ≡ the batch build — same oracle
    "stream_cms" -> Dedup.sketchCmsSql,
    // stream-static gate ≡ the batch decontaminate key — same oracle
    "stream_decontaminate" -> Curation.decontaminateSql,
    // stream-static band probe ≡ the relational self-join — same bands
    "stream_srp_probe" -> streamSrpProbeSql,
    "stream_dedup" -> streamDedupSql,
    // identical sessions to the batch operator — the whole point
    "stream_sessionize" -> PipelineOps.sessionizeSql,
    // continuous rollup ≡ batch cascade: literally the same oracles
    "stream_rollup" -> CoreQueries.rollupCascade5mSql,
    "stream_rollup_1h" -> CoreQueries.rollupCascade1hSql,
    "stream_fetch_agg" -> streamFetchAggSql,
    "stream_asof" -> streamAsofSql)
}
