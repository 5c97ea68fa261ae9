package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Carbon plaintext line protocol — the whisper ecosystem's canonical
  * ingest format (`<metric.path> <value> <epoch-seconds>\n`, one point
  * per line, whitespace-separated; graphite's carbon daemon feeds
  * whisper files from exactly this). Re-expressed as a Spark source:
  * `spark.read.text` (or `readStream.text` — the parse is a pure
  * projection, so the same function serves batch and streaming) into
  * the engine's canonical `(metric, ts_s, value)` points frame.
  *
  * Carbon's tolerances, kept: a timestamp of `-1` means "receive time"
  * (the caller's pinned `nowS` here — never the wall clock; for live
  * long-running streams [[parseArrival]] stamps the micro-batch clock
  * instead), and
  * malformed lines are DROPPED, not fatal (carbon logs and continues;
  * a 100 TB backfill must not die on one bad line). Use
  * [[parsedObserved]] / [[parsedObservedStream]] when the drop count
  * must be observable — the counters ride the caller's action, no
  * re-scan.
  */
object Carbon {

  /** Parse a `text`-sourced frame (one `value` column of raw lines)
    * into points. Whitespace-tolerant; blank and malformed lines drop.
    * ONE predicate chain owns the accept/drop contract — this is
    * [[classified]] filtered to the accepted rows, so the plain parse
    * and the observed variants cannot drift apart.
    */
  def parse(lines: DataFrame, nowS: Long): DataFrame =
    classified(lines, nowS)
      .filter(col("ok"))
      .select(col("metric"), col("ts_s"), col("value"))

  /** Accepted points instrumented with a SINGLE-PASS drop counter via
    * `DataFrame.observe`: the `dropped`/`accepted` metrics ride the
    * caller's own action instead of re-scanning the input (the r9 form
    * ran two extra `count()`s — two full re-reads of a 100 TB
    * backfill). Batch: run any action on the returned frame, then
    * `observation.get("dropped")`. The classification (`ok`) is the
    * same predicate chain as [[parse]], evaluated null-safely
    * (`try_element_at`/`try_cast`) BEFORE the filter so rejected rows
    * are still countable.
    */
  def parsedObserved(lines: DataFrame, nowS: Long,
      name: String = "carbon_parse"): (DataFrame, Observation) = {
    // the name is caller-overridable like the streaming variant's:
    // observed-metric names must be unique per query, and a batch that
    // unions two ingest sources would otherwise fail with 'multiple
    // definitions of observed metrics named carbon_parse' (r15 review)
    val obs = Observation(name)
    (classified(lines, nowS)
      .observe(obs,
        // count(when) not sum(when): sum over a zero-row frame is NULL,
        // and an empty batch must report dropped = accepted = 0, not
        // NPE the monitoring code reading the metric as a Long
        count(when(col("nonblank") && !col("ok"), 1L)).as("dropped"),
        count(when(col("ok"), 1L)).as("accepted"))
      .filter(col("ok"))
      .select(col("metric"), col("ts_s"), col("value")), obs)
  }

  /** [[parsedObserved]] for Structured Streaming, where [[Observation]]
    * is unsupported: name-keyed `observe`, surfaced per micro-batch in
    * `StreamingQueryProgress.observedMetrics(name)`.
    */
  def parsedObservedStream(lines: DataFrame, nowS: Long,
      name: String = "carbon_parse"): DataFrame =
    classified(lines, nowS)
      .observe(name,
        // count(when), matching [[parsedObserved]]: an empty
        // micro-batch — routine in streaming — must observe 0, not NULL
        count(when(col("nonblank") && !col("ok"), 1L)).as("dropped"),
        count(when(col("ok"), 1L)).as("accepted"))
      .filter(col("ok"))
      .select(col("metric"), col("ts_s"), col("value"))

  /** One row per input line with the accept/drop verdict and the parsed
    * fields: every access is null-tolerant (`try_element_at` for the
    * arity gap, `try_cast` for malformed numbers) because under ANSI a
    * raw index or cast on a bad line would abort the scan.
    */
  private def classified(lines: DataFrame, nowS: Long): DataFrame =
    classified(lines, lit(nowS))

  private def classified(lines: DataFrame, nowCol: Column): DataFrame = {
    // ONE regex pass per line: the maximal non-whitespace runs ARE the
    // fields (r12 plan finding: the trim-then-split form ran two regex
    // passes, and filter pushdown re-inlined them per consumer — the
    // dominant per-row cost of the whole ingest key). Blankness falls
    // out as the empty token array.
    //
    // The tokenizer is FENCED (r16 verdict #2): unfenced, the consumers'
    // `ok` filter pushes below this projection — PushDownPredicates
    // moves a filter through a Project whenever the PROJECT FIELDS are
    // deterministic, regardless of the condition (so fencing the filter
    // condition itself does nothing) — and alias substitution re-inlines
    // the regex into each of the five `ok` conjuncts. FilterExec codegen
    // does not subexpression-eliminate across conjuncts (verified on the
    // generated code: six distinct regexp evaluation sites per line,
    // zero filter-side subExpr functions; only HashAggregate CSEs), so
    // every line paid SIX regex passes. A fenced (non-deterministic)
    // field pins the filter above this projection and CollapseProject
    // leaves the alias uninlined, so each line tokenizes exactly once.
    val toks = graft.functions.OptimizerFence.fence(
      regexp_extract_all(col("value"), lit("\\S+"), lit(0)))
    lines
      .select(toks.as("f"))
      // nonblank derives from the `f` ATTRIBUTE, not the tokenizer
      // expression: the fence is non-deterministic, which also excludes
      // it from projection-side subexpression elimination — a same-level
      // `size(toks)` alias would evaluate the tokenizer a SECOND time
      // per line (PlanSpec pins the single site)
      .withColumn("nonblank", size(col("f")) =!= 0)
      .withColumn("metric", expr("try_element_at(f, 1)"))
      .withColumn("ts_raw", expr("try_cast(try_element_at(f, 3) AS BIGINT)"))
      .withColumn("num", expr("try_cast(try_element_at(f, 2) AS DOUBLE)"))
      .withColumn("ok", col("nonblank") && size(col("f")) === 3 &&
        col("metric") =!= "" && col("ts_raw").isNotNull &&
        col("num").isNotNull)
      .withColumn("ts_s",
        when(col("ts_raw") === -1L, nowCol).otherwise(col("ts_raw")))
      .withColumn("value", col("num"))
  }

  /** Serialize a points frame back to protocol lines (fixture/export
    * side; Java double→string round-trips exactly, so parse ∘ format
    * is the identity on values).
    */
  def format(points: DataFrame): DataFrame =
    // fail loudly on null fields: concat_ws SKIPS nulls, so a null
    // value would silently emit a 2-token line that parse then
    // silently drops — the roundtrip identity must not leak points
    // (review r10)
    points.select(
      when(col("metric").isNull || col("ts_s").isNull || col("value").isNull,
        raise_error(lit("carbon format: null metric/ts_s/value — " +
          "whisper points cannot be null; filter gaps before export")))
      .otherwise(concat_ws(" ",
        col("metric"), col("value").cast("string"),
        col("ts_s").cast("string"))).as("value"))

  /** [[parse]] with carbon's REAL receive-time semantics for
    * long-running streams: `-1` timestamps stamp the micro-batch's
    * processing clock (`current_timestamp`), not a query-start pin — a
    * `-1` line arriving on day 3 of a stream lands on day 3, exactly
    * what the carbon daemon does. The trade is determinism: an epoch
    * REPLAY re-stamps with the replay clock, so use the pinned-`nowS`
    * [[parse]] wherever hash-stable output matters (every oracle path
    * does) and this only on live arrival-time ingest.
    */
  def parseArrival(lines: DataFrame): DataFrame =
    classified(lines, unix_timestamp(current_timestamp()))
      .filter(col("ok"))
      .select(col("metric"), col("ts_s"), col("value"))
}
