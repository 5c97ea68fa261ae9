package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline operators beyond the SURVEY.md §2.9 extension
  * set — the operations a 100 TB corpus build runs between ingest and
  * training: sessionization of event streams, deterministic stratified
  * sampling, source-mix accounting for data mixing, and PII scrubbing.
  * No reference counterpart (whisper has no document plane); every op is
  * oracle-checked against DuckDB on the same parquet.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private val toksExpr = Tokens.toksExpr
  private val toksSql = Tokens.toksSql

  // ---------------------------------------------------------- sessionize

  /** Session gap: a pause > 30 min starts a new session. */
  val SessionGapS = 1800L

  /** `sessionize`: classic gap-based sessionization of the event stream —
    * per metric, order by time, start a new session when the gap from the
    * previous event exceeds [[SessionGapS]]; emit per-session start,
    * event count and duration.
    *
    * Determinism under duplicate timestamps: a tie row's gap to its
    * predecessor is 0 regardless of tie order, and the running sum uses
    * the default RANGE frame (ties share a frame) in both engines, so
    * session ids do not depend on tie-breaking.
    *
    * Scale: one shuffle keyed by metric + one in-partition sort — the
    * canonical sessionize shape. Low-cardinality metric keys skew at
    * 100 TB; the production variant range-partitions on (metric, day)
    * and stitches sessions across day boundaries in a second pass.
    */
  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeFrom(Buckets.points(s, dir))

  private[graft] def sessionizeFrom(pts: DataFrame): DataFrame = {
    val w = Window.partitionBy("metric").orderBy("ts_s")
    val flagged = pts
      .withColumn("prev_ts", lag(col("ts_s"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_s") - col("prev_ts") > SessionGapS, 1L).otherwise(0L))
    flagged
      .withColumn("sid", sum(col("new_sess")).over(
        Window.partitionBy("metric").orderBy("ts_s")
          .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("metric", "sid")
      .agg(
        min(col("ts_s")).as("session_start"),
        count(lit(1)).as("n_events"),
        (max(col("ts_s")) - min(col("ts_s"))).as("duration_s"))
      .select("metric", "session_start", "n_events", "duration_s")
      .orderBy("metric", "session_start")
  }

  /** `sessionize_scalable`: the skew-safe two-pass form of [[sessionize]]
    * (the production variant X7's design note names). Pass 1 sessionizes
    * WITHIN (metric, day) partitions — the hot metric that overwhelms a
    * single `partitionBy(metric)` task is spread across its days. Pass 2
    * stitches across day boundaries by re-running the identical gap rule
    * on the LOCAL-SESSION frame (one row per local session, ordered by
    * start): sessions chained by gaps ≤ [[SessionGapS]] collapse into
    * one. Volume drops by the mean session size between passes, so the
    * per-metric window in pass 2 sorts sessions, not events.
    *
    * Exactness: within a day pass 1 is plain sessionization; a global
    * session crossing midnight is a chain of local sessions whose
    * boundary gaps are ≤ the threshold (every intra-session event gap
    * is), and pass 2's rule merges exactly those chains. Pinned equal to
    * [[sessionize]] by test; shares its oracle SQL.
    */
  def sessionizeScalable(s: SparkSession, dir: String): DataFrame =
    sessionizeScalableFrom(Buckets.points(s, dir))

  private[graft] def sessionizeScalableFrom(pts: DataFrame): DataFrame = {
    val wd = Window.partitionBy("metric", "day").orderBy("ts_s")
    val local = pts
      .withColumn("day", expr("ts_s div 86400"))
      .withColumn("prev_ts", lag(col("ts_s"), 1).over(wd))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_s") - col("prev_ts") > SessionGapS, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(
        wd.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("metric", "day", "sid")
      .agg(min(col("ts_s")).as("s_start"), max(col("ts_s")).as("s_end"),
        count(lit(1)).as("n"))
    // pass 2 over session rows; s_start is unique per metric (two events
    // with one ts land in one local session), so ROWS framing is exact
    val wm = Window.partitionBy("metric").orderBy("s_start")
    local
      .withColumn("prev_end", lag(col("s_end"), 1).over(wm))
      .withColumn("new_g",
        when(col("prev_end").isNull ||
          col("s_start") - col("prev_end") > SessionGapS, 1L).otherwise(0L))
      .withColumn("gid", sum(col("new_g")).over(
        wm.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("metric", "gid")
      .agg(min(col("s_start")).as("session_start"), sum(col("n")).as("n_events"),
        (max(col("s_end")) - min(col("s_start"))).as("duration_s"))
      .select("metric", "session_start", "n_events", "duration_s")
      .orderBy("metric", "session_start")
  }

  val sessionizeSql: String =
    s"""WITH ${Buckets.pointsSql},
       |flagged AS (
       |  SELECT metric, ts_s,
       |         CASE WHEN lag(ts_s) OVER mw IS NULL
       |                OR ts_s - lag(ts_s) OVER mw > $SessionGapS
       |              THEN 1 ELSE 0 END AS new_sess
       |  FROM pts
       |  WINDOW mw AS (PARTITION BY metric ORDER BY ts_s)),
       |sess AS (
       |  SELECT metric, ts_s,
       |         sum(new_sess) OVER (PARTITION BY metric ORDER BY ts_s) AS sid
       |  FROM flagged)
       |SELECT metric, min(ts_s) AS session_start, count(*) AS n_events,
       |       max(ts_s) - min(ts_s) AS duration_s
       |FROM sess GROUP BY metric, sid
       |ORDER BY metric, session_start""".stripMargin

  // --------------------------------------------------- stratified sampling

  /** Deterministic sample keep-rate: first md5 byte < 26 ⇒ ~10.2%. */
  val SampleBuckets = 26

  /** `sample_stratified`: deterministic hash-based stratified sampling —
    * keep a document iff the first byte of md5(lang || '|' || doc_id) is
    * below [[SampleBuckets]]. Salting the hash with the stratum (lang)
    * decorrelates the per-stratum samples; both engines compute the
    * identical md5, so the sample is reproducible anywhere — the property
    * a training-data pipeline needs for held-out splits. Pure map-side
    * filter: no shuffle, no RNG state, scales linearly.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("h", md5(concat(col("lang"), lit("|"), col("doc_id").cast("string"))))
      .withColumn("bucket",
        expr(Tokens.byteBucketExpr("h")))
      .filter(col("bucket") < SampleBuckets)
      .select(col("doc_id"), col("lang"), col("source"), col("bucket"))
      .orderBy("doc_id")

  val sampleStratifiedSql: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang, source,
       |         md5(lang || '|' || CAST(doc_id AS VARCHAR)) AS h
       |  FROM documents)
       |SELECT doc_id, lang, source,
       |       ${Tokens.byteBucketSql("h")} AS bucket
       |FROM h
       |WHERE ${Tokens.byteBucketSql("h")} < $SampleBuckets
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- source mix

  /** `source_mix`: per (source, lang) corpus accounting — doc counts,
    * token sums, and each lang's token share within its source — the
    * numbers a data-mixing stage weights against. One aggregation plus a
    * window over the (tiny) aggregated frame; shares divide exact integer
    * sums cast to double, identically in both engines.
    */
  def sourceMix(s: SparkSession, dir: String): DataFrame = {
    val agg = docs(s, dir).withColumn("toks", expr(toksExpr))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("n_tokens"))
    agg
      .withColumn("tok_share",
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(Window.partitionBy("source")), 6))
      .select("source", "lang", "n_docs", "n_tokens", "tok_share")
      .orderBy("source", "lang")
  }

  val sourceMixSql: String =
    s"""WITH agg AS (
       |  SELECT source, lang, count(*) AS n_docs,
       |         CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source, lang)
       |SELECT source, lang, n_docs, n_tokens,
       |       round(CAST(n_tokens AS DOUBLE) /
       |             sum(n_tokens) OVER (PARTITION BY source), 6) AS tok_share
       |FROM agg ORDER BY source, lang""".stripMargin

  /** Documents retained per source by [[sourceCap]] (the fixture has 25
    * docs per source at sf0.001/sf0.01 and 250 at sf0.1, so 18 keeps
    * and drops on both sides of the cap at every SF).
    */
  val SourceCapN = 18

  /** `source_cap`: per-domain frequency capping — at most [[SourceCapN]]
    * documents survive per source, chosen by a salted deterministic hash
    * (md5 over doc_id), i.e. a uniform random-but-reproducible sample of
    * each over-represented source. The standard web-corpus balance
    * control (a handful of mega-domains otherwise dominate the token
    * mix); ranking by hash rather than by position avoids crawl-order
    * bias, and any engine anywhere reproduces the identical kept set.
    *
    * At 100 TB: the window partitions by source, so each sort is
    * per-source (never global); ONE pathological mega-source is a skew
    * risk — the hash ranking makes a two-pass form possible (per-source
    * counts, then keep docs whose hash falls under the source's
    * cap/count quantile of md5 space — approximate but single-scan);
    * this exact-rank form is the oracle shape, like `shard_pack` for
    * its scalable sibling.
    */
  def sourceCap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(lit("cap|"), col("doc_id").cast("string"))), col("doc_id"))
    docs(s, dir).select(col("doc_id"), col("source"))
      .withColumn("rank_in_source", row_number().over(w))
      .withColumn("kept", (col("rank_in_source") <= SourceCapN).cast("int"))
      .orderBy("doc_id")
  }

  val sourceCapSql: String =
    s"""SELECT doc_id, source, rank_in_source,
       |       CASE WHEN rank_in_source <= $SourceCapN THEN 1 ELSE 0 END AS kept
       |FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY md5('cap|' || CAST(doc_id AS VARCHAR)), doc_id)
       |           AS rank_in_source
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------- temperature-scaled source mix

  /** Fraction of the corpus token count the resampled mixture targets. */
  val MixBudgetFrac = 0.5

  /** `mix_temperature`: temperature-scaled source resampling — the
    * multilingual-LM mixing rule (Lample & Conneau, arXiv:1901.07291;
    * also mT5/XLM-R): source i's share of a [[MixBudgetFrac]]·total
    * token budget is ∝ n_i^α with α = 0.5 (√-temperature flattens the
    * head so mega-sources stop dominating, exactly what [[sourceCap]]
    * does bluntly by count). Docs fill each source's budget in salted-
    * hash order (reproducible uniform sample); a doc is kept while the
    * budget is unfilled when it starts, so the crossing doc is kept and
    * a budget is met whenever the source can cover it. Resampling only
    * DOWN-samples: a small source whose √-boosted target exceeds its
    * own token count keeps everything and under-fills — the emitted
    * `target_tokens` column makes that shortfall visible (an up-sampling
    * consumer turns it into a repeat factor; this operator does not
    * duplicate rows). One row per doc with its rank, its source's
    * target, and the verdict.
    *
    * Determinism across engines: per-source token sums are exact
    * integers; √ and the budget arithmetic are IEEE doubles with an
    * identical expression tree; the √-sum denominator is a FOLD OVER THE
    * SOURCE-SORTED list in both engines (Spark `aggregate(array_sort(
    * collect_list(…)))`, DuckDB `list_reduce(list(… ORDER BY source))`)
    * so summation order — the one FP hazard — is pinned (the powSeries
    * trick). 20 sources → the fold is driver-negligible.
    *
    * At 100 TB: pass 1 is one map-side-partial aggregation (k sources
    * shuffle, not n docs); the tiny per-source budget table broadcasts;
    * pass 2 is one per-source window — same skew note as [[sourceCap]],
    * same quantile-threshold escape hatch.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val dt = docs(s, dir).select(col("doc_id"), col("source"),
      expr(s"size($toksExpr)").cast("long").as("n_toks"))
    val src = dt.groupBy("source").agg(sum("n_toks").as("src_tokens"))
    val denom = src.agg(
      expr("aggregate(transform(array_sort(collect_list(struct(source, " +
        "sqrt(CAST(src_tokens AS DOUBLE)) AS w))), x -> x.w), " +
        "CAST(0 AS DOUBLE), (a, x) -> a + x)").as("d"),
      sum("src_tokens").as("grand"))
    val tgt = src.crossJoin(broadcast(denom))
      .withColumn("target_tokens",
        round(lit(MixBudgetFrac) * col("grand") *
          sqrt(col("src_tokens").cast("double")) / col("d"), 0).cast("long"))
      .select("source", "target_tokens")
    val w = Window.partitionBy("source")
      .orderBy(md5(concat(lit("mixt|"), col("doc_id").cast("string"))),
        col("doc_id"))
    dt.withColumn("rank_in_source", row_number().over(w))
      .withColumn("cum_before", coalesce(
        sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .join(broadcast(tgt), "source")
      .withColumn("kept", (col("cum_before") < col("target_tokens")).cast("int"))
      .select("doc_id", "source", "n_toks", "rank_in_source",
        "target_tokens", "kept")
      .orderBy("doc_id")
  }

  val mixTemperatureSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, source, CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents),
       |src AS (
       |  SELECT source, sum(n_toks) AS src_tokens FROM dt GROUP BY source),
       |denom AS (
       |  SELECT list_reduce(list(sqrt(CAST(src_tokens AS DOUBLE)) ORDER BY source),
       |                     (a, b) -> a + b) AS d,
       |         sum(src_tokens) AS grand FROM src),
       |tgt AS (
       |  SELECT s.source,
       |         CAST(round(CAST($MixBudgetFrac AS DOUBLE) * d.grand *
       |                    sqrt(CAST(s.src_tokens AS DOUBLE)) / d.d) AS BIGINT)
       |           AS target_tokens
       |  FROM src s, denom d),
       |ranked AS (
       |  SELECT doc_id, source, n_toks,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY md5('mixt|' || CAST(doc_id AS VARCHAR)), doc_id)
       |           AS rank_in_source,
       |         coalesce(sum(n_toks) OVER (PARTITION BY source
       |           ORDER BY md5('mixt|' || CAST(doc_id AS VARCHAR)), doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS cum_before
       |  FROM dt)
       |SELECT r.doc_id, r.source, r.n_toks, r.rank_in_source,
       |       t.target_tokens,
       |       CASE WHEN r.cum_before < t.target_tokens THEN 1 ELSE 0 END AS kept
       |FROM ranked r JOIN tgt t USING (source)
       |ORDER BY r.doc_id""".stripMargin

  // ----------------------------------------------------------- PII scrub

  /** Email-ish addresses or long digit runs — patterns valid in both
    * Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.
    */
  val PiiPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|[0-9]{6,}"

  /** `text_pii_scrub`: redact PII-shaped spans and report the redaction
    * count per document. The synthetic corpus is word salad, so hit
    * counts are typically zero — the operator demonstrates the scrub
    * machinery (count + global replace + stable prefix) that runs
    * unchanged on a real corpus. Map-side only.
    */
  def textPiiScrub(s: SparkSession, dir: String): DataFrame =
    // Column API only — routing the pattern through expr()/SQL would eat
    // the `\.` escape (Spark SQL string literals process backslashes),
    // silently loosening the regex
    docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(PiiPattern), lit(0)))
          .as("n_redactions"),
        substring(regexp_replace(col("text"), PiiPattern, "<PII>"), 1, 60)
          .as("scrubbed_prefix"))
      .orderBy("doc_id")

  val textPiiScrubSql: String =
    s"""SELECT doc_id,
       |       len(regexp_extract_all(text, '$PiiPattern')) AS n_redactions,
       |       substr(regexp_replace(text, '$PiiPattern', '<PII>', 'g'), 1, 60)
       |         AS scrubbed_prefix
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- shard pack

  /** Token budget per training shard. */
  val ShardTokens = 4096L

  /** `shard_pack`: pack documents into fixed-token-budget training
    * shards — the step between a curated corpus and a tokenizer run.
    * Deterministic first-fit in doc_id order: a document's shard is its
    * EXCLUSIVE running token total divided by the budget (documents
    * larger than a budget span shards by construction of the formula,
    * matching the sequential packer). The global running sum is the
    * direct form (and the oracle); it needs a total order, so at scale
    * use [[shardPackScalable]].
    */
  def shardPack(s: SparkSession, dir: String): DataFrame =
    shardPackFrom(docTokens(s, dir))

  private def docTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(expr(toksExpr)).cast("long").as("n_tokens"))

  private[graft] def shardPackFrom(tok: DataFrame): DataFrame =
    tok.withColumn("prior",
        sum(col("n_tokens")).over(
          Window.orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        // integer div, not double `/`: prior at corpus scale exceeds
        // double's 2^53 exact range
        expr(s"prior div $ShardTokens").as("shard"))
      .orderBy("doc_id")

  /** `shard_pack_scalable`: the distributed prefix-sum form of
    * [[shardPack]] — the single-partition global window above is the
    * textbook scale bottleneck. Pass 1 sums tokens per contiguous
    * doc_id RANGE block (map-side partial agg); pass 2 turns the tiny
    * per-block frame into exclusive block offsets (a window over
    * #blocks rows, not #docs); pass 3 broadcasts the offsets back and
    * computes each doc's global prior as block offset + within-block
    * running sum. Identical output to the direct form (pinned by test;
    * shares its oracle SQL) with every per-document window keyed by
    * block.
    */
  def shardPackScalable(s: SparkSession, dir: String): DataFrame =
    shardPackScalableFrom(docTokens(s, dir))

  private[graft] val ShardBlock = 512L

  private[graft] def shardPackScalableFrom(tok: DataFrame): DataFrame = {
    // block width derives from the OBSERVED doc_id range, not a fixed
    // divisor: value-keyed blocks with a fixed width degrade to one doc
    // per block under sparse ids (hash-like doc_ids), turning the tiny
    // offsets pass back into the full-size bottleneck. Sizing width as
    // range·ShardBlock/n keeps #blocks ≈ n/ShardBlock for near-uniform
    // ids; heavily CLUSTERED ids can still skew individual blocks (a
    // row-bucket key would need the very global order this avoids).
    // Any order-aligned contiguous blocking yields identical output.
    // the sizing pass projects doc_id ALONE so Catalyst prunes the
    // tokenization out of it — a cheap id-column scan, not a third full
    // token pass (plan-only callers still trigger this small job)
    val head = tok.select(col("doc_id"))
      .agg(min("doc_id"), max("doc_id"), count(lit(1))).head()
    val n = head.getLong(2)
    if (n == 0)
      return tok.select(col("doc_id"), col("n_tokens"), lit(0L).as("shard"))
    // min/max are null when every id is null — any width serves the one
    // coalesced block then
    val (lo, hi) =
      if (head.isNullAt(0)) (0L, 0L) else (head.getLong(0), head.getLong(1))
    // BigInt: range·ShardBlock overflows Long for hash-like id ranges;
    // the unanchored `doc_id div width` (monotone even across zero for
    // truncating division) avoids a `doc_id - lo` overflow the same way.
    // `coalesce(..., MinValue)` gives null doc_ids their own FIRST block
    // — a bare null blk would never match the offsets join key and the
    // rows would silently vanish, where the direct form keeps them
    val width = ((BigInt(hi) - BigInt(lo) + 1) * ShardBlock / n)
      .max(1).min(Long.MaxValue).toLong
    val blocked = tok.withColumn("blk",
      expr(s"coalesce(doc_id div $width, ${Long.MinValue}L)"))
    val offsets = blocked.groupBy("blk")
      .agg(sum(col("n_tokens")).as("bn"))
      .withColumn("blk_off",
        coalesce(sum(col("bn")).over(
          Window.orderBy("blk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)),
          lit(0L)))
      .select("blk", "blk_off")
    val wb = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    blocked.join(broadcast(offsets), Seq("blk"))
      .withColumn("prior",
        col("blk_off") + sum(col("n_tokens")).over(wb) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"prior div $ShardTokens").as("shard"))
      .orderBy("doc_id")
  }

  val shardPackSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS prior
       |  FROM tok)
       |SELECT doc_id, n_tokens, CAST(prior // $ShardTokens AS BIGINT) AS shard
       |FROM cum ORDER BY doc_id""".stripMargin
}
