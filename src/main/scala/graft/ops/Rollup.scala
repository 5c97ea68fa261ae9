package graft.ops

import graft.model.AggregationMethod
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rollup / propagation cascade — whisper's signature operator
  * (reference: whisper.go → `func (whisper *Whisper) propagate`,
  * `func aggregate`; SURVEY.md §2.4, §2.5).
  *
  * Whisper propagates each write down the archive list: the consolidation
  * window of a coarser archive aggregates the `lower.spp / higher.spp`
  * finer-archive slots it covers, gated by xFilesFactor (emit only if
  * `known/total >= xff`). This engine re-derives every level wholesale
  * from the previous one (SURVEY.md §2.5 R2: equivalent end-state for
  * complete batches) — each level is one hash aggregation, and the whole
  * cascade is a fold over the retention list.
  *
  * Scale notes (100 TB): each level's input is the previous level's
  * output, so data volume shrinks by the spp ratio at every step; the
  * first (finest) level is the only full-data shuffle. Levels are
  * idempotent re-derivations — safe to recompute per time-partition, so a
  * production pipeline would partition `points_<spp>s` by `date(bucket_ts)`
  * and only re-derive partitions touched by new data (SURVEY.md §7.4
  * note 5). The xFF gate is a post-aggregation filter on the already
  * reduced rows — negligible cost.
  */
object Rollup {

  /** `func aggregate(method, knownValues)`: the consolidation functions
    * over a consolidation window (SURVEY.md §2.4 A1–A5 plus graphite's
    * whisper.py trio — avg_zero, absmax, absmin).
    * `Last` = value at the latest finer-archive interval in the window
    * (`max_by(value, bucket_ts)`; bucket_ts values are distinct within a
    * window after LWW alignment, so no further tiebreak is needed).
    * `AbsMax`/`AbsMin` = the value of largest/smallest magnitude, sign
    * preserved; whisper.py's `max(knownValues, key=abs)` keeps the FIRST
    * max in window (time) order on magnitude ties, so the tiebreak is
    * earliest ts, then smallest value (the value leg only matters for
    * raw-point inputs where one ts can repeat — archive slots are unique).
    * `AvgZero` needs the window slot count — use the [[aggColumn]]
    * overload that takes `totalSlots`.
    */
  /** Exact ORDER-INDEPENDENT Σ value for GRID-QUANTIZED inputs — the
    * consolidation hot path. Every value on the engine's point/render
    * grid carries ≤6 decimals (testdata values have ≤3; every
    * division-derived edge rounds through [[Buckets.round6]]), so
    * `round(v·1e6)` recovers the exact scaled integer (the double sits
    * within ~1e-9 of it — far from any rounding midpoint, and far from
    * the 2^52 exactness edge for |v| < 4·10⁹). Summing those integers
    * as DECIMAL(38,0) is exact and associative, so Spark keeps
    * map-side partial aggregation (codegen'd HashAggregate, one partial
    * sum per group through the shuffle) instead of shipping every raw
    * point in a `collect_list` — at a 1s→5m consolidation that is 300×
    * fewer shuffled bytes on the engine's signature operator. The
    * DuckDB oracle sums the identical integers as HUGEINT; both engines
    * then convert the SAME exact integer to double (identical IEEE
    * nearest-even if it ever exceeds 2^53) and unscale by 1e6 — every
    * step bit-identical across engines AND across any partition layout
    * or merge order.
    *
    * For inputs that are NOT grid-quantized (full-mantissa doubles:
    * ln() scores, v·w products), use [[orderedSumBy]] — fixed-point
    * would silently quantize them.
    */
  private def fixedSum(value: Column): Column =
    sum(round(value * lit(1e6)).cast("decimal(38,0)"))
      .cast("double") / lit(1e6)

  /** [[fixedSum]] in the oracle dialect: the same scale → round →
    * integer-sum → double → unscale pipeline (`1e6` is a DOUBLE literal
    * in both dialects; HUGEINT is DuckDB's exact 128-bit integer).
    */
  private[graft] def fixedSumSql(v: String = "value"): String =
    s"CAST(sum(CAST(round($v * 1e6) AS HUGEINT)) AS DOUBLE) / 1e6"

  /** The fully-pinned consolidation mean over grid-quantized values:
    * exact fixed-point sum ÷ count, rounded through [[Buckets.round6]]
    * — bit-identical across engines at any scale factor, and partial-
    * aggregable (plain HashAggregate plan).
    */
  private[graft] def mean6(value: Column): Column =
    Buckets.round6(fixedSum(value) / count(value))

  /** [[mean6]] in the oracle dialect. */
  private[graft] def mean6Sql(v: String = "value"): String =
    Buckets.round6Sql(s"${fixedSumSql(v)} / count($v)")

  /** [[mean6]] over a NULLABLE column (dense frames carry null gap
    * slots): `sum`/`count` skip nulls identically in both engines, and
    * an all-null group yields NULL — exactly `avg`'s null contract,
    * with the arithmetic and the rounding pinned.
    */
  private[graft] def gridMean6(value: Column): Column =
    when(count(value) > 0, Buckets.round6(fixedSum(value) / count(value)))

  /** [[gridMean6]] in the oracle dialect. */
  private[graft] def gridMean6Sql(v: String = "v"): String =
    s"CASE WHEN count($v) > 0 THEN ${Buckets.round6Sql(
      s"${fixedSumSql(v)} / count($v)")} END"

  /** Ordered left fold Σ value with addends SORTED BY (key, value) —
    * for NON-grid-quantized inputs (full-mantissa doubles: lm_score's
    * ln() terms, weightedAverage's v·w products) where [[fixedSum]]
    * would quantize. An unordered double sum's merge order varies with
    * task timing and differs from DuckDB's; sorting pins it. The
    * collected array is a consolidation window or per-doc term list —
    * schema- or document-bounded, never corpus-proportional. Inputs
    * must be non-null.
    */
  private[graft] def orderedSumBy(value: Column, key: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(key.as("t"), value.as("v")))),
        x => x.getField("v")),
      lit(0d), (a, v) => a + v)

  /** The matching DuckDB fold (list ORDER BY key, value; left-assoc).
    * `v` names the value expression (default the canonical `value`).
    */
  private[graft] def orderedSumSql(ts: String, v: String = "value"): String =
    s"list_reduce(list($v ORDER BY $ts, $v), (a, x) -> a + x)"

  def aggColumn(method: AggregationMethod, value: Column, ts: Column): Column =
    method match {
      case AggregationMethod.Average => fixedSum(value) / count(value)
      case AggregationMethod.Sum     => fixedSum(value)
      case AggregationMethod.Last    => max_by(value, ts)
      case AggregationMethod.Max     => max(value)
      case AggregationMethod.Min     => min(value)
      case AggregationMethod.AbsMax  =>
        max_by(value, struct(abs(value), -ts, -value))
      case AggregationMethod.AbsMin  =>
        min_by(value, struct(abs(value), ts, value))
      case AggregationMethod.AvgZero =>
        throw new IllegalArgumentException(
          "avg_zero divides by the window slot count — pass totalSlots " +
            "via aggColumn(method, value, ts, totalSlots)")
    }

  /** [[aggColumn]] with the consolidation window's slot count available:
    * `AvgZero` = sum of known values over ALL window slots (whisper.py
    * treats absent slots as 0 — `sum(x or 0) / len(neighborValues)`).
    * `totalSlots` is a per-input-row column, constant within a group.
    */
  def aggColumn(method: AggregationMethod, value: Column, ts: Column,
      totalSlots: Column): Column =
    method match {
      case AggregationMethod.AvgZero => fixedSum(value) / max(totalSlots)
      case other                     => aggColumn(other, value, ts)
    }

  /** SQL-shape of [[aggColumn]] for the oracle dialect. `Last` uses the
    * window form (`row_number` over ts DESC) handled in [[propagateSql]];
    * `AbsMax`/`AbsMin` use DuckDB's ordered `array_agg` and `AvgZero`
    * interpolates the slot count — all three emitted in [[propagateSql]].
    */
  private def aggSql(method: AggregationMethod, ts: String): String =
    method match {
      case AggregationMethod.Average => s"${fixedSumSql()} / count(value)"
      case AggregationMethod.Sum     => fixedSumSql()
      case AggregationMethod.Max     => "max(value)"
      case AggregationMethod.Min     => "min(value)"
      case AggregationMethod.Last =>
        throw new IllegalArgumentException("Last uses propagateSql's window form")
      case other =>
        throw new IllegalArgumentException(
          s"${other.name} is emitted inline by propagateSql")
    }

  /** Ordered-first-element oracle form shared by the magnitude methods:
    * DuckDB's `array_agg(value ORDER BY …)[1]` with the same total order
    * as the Spark struct tiebreak. `ts` names the finer time column.
    */
  private[graft] def absSql(method: AggregationMethod, ts: String): String =
    method match {
      case AggregationMethod.AbsMax =>
        s"(array_agg(value ORDER BY abs(value) DESC, $ts ASC, value ASC))[1]"
      case AggregationMethod.AbsMin =>
        s"(array_agg(value ORDER BY abs(value) ASC, $ts ASC, value ASC))[1]"
      case other =>
        throw new IllegalArgumentException(s"not a magnitude method: $other")
    }

  /** R1 `propagate`: one cascade step. Input: a finer level
    * `(metric, bucket_ts, value)` at resolution `higherSpp`; output the
    * coarser level at `lowerSpp` with whisper's quality metadata:
    * `(metric, bucket_ts, value, known, total)` where
    * `total = lowerSpp / higherSpp` slots and `known` = slots present.
    * Rows failing `known/total >= xff` are dropped (the gate; whisper
    * additionally stops cascading for that bucket — identical end state
    * since coarser levels re-derive from this output).
    */
  def propagate(
      level: DataFrame,
      higherSpp: Int,
      lowerSpp: Int,
      method: AggregationMethod,
      xff: Double): DataFrame = {
    require(lowerSpp % higherSpp == 0, s"$lowerSpp not a multiple of $higherSpp")
    val total = lowerSpp / higherSpp
    val agg = aggColumn(method, col("value"), col("bucket_ts"),
      lit(total.toLong))
    // a level's Average/AvgZero value is rounded to the engine's
    // 6-decimal grid AT EMISSION — a propagated level is a stored level
    // (whisper writes it into the coarser archive), and every stored
    // value in this engine lives on the grid. This also makes
    // [[fixedSum]]'s grid premise true by construction when the NEXT
    // cascade hop consolidates this output: without it, an
    // avg-of-avg chain would feed full-mantissa quotients into the
    // fixed-point sum and quantize them implicitly there instead of
    // at the level boundary. Sum/Max/Min/Last/Abs* outputs of grid
    // inputs are already exactly on the grid — left unrounded.
    val value = method match {
      case AggregationMethod.Average | AggregationMethod.AvgZero =>
        Buckets.round6(agg)
      case _ => agg
    }
    level
      .groupBy(col("metric"), Buckets.alignTs(col("bucket_ts"), lowerSpp).as("bucket_ts"))
      .agg(value.as("value"), count(lit(1)).as("known"))
      .withColumn("total", lit(total.toLong))
      // float32 compare, as whisper (the header stores xff as float32):
      // the known/total quotient is rounded to float32 before comparing
      // against float32(xff). Spark's Divide always promotes to double,
      // so the float32 semantics come from rounding the double quotient —
      // the oracle SQL rounds the same way, keeping both engines
      // bit-identical. For realistic window sizes this decides exactly
      // like Go's float32 division.
      .filter((col("known").cast("double") / col("total")).cast("float")
        >= lit(xff.toFloat))
  }

  /** SQL-shape of [[propagate]] over a CTE named `src`. */
  def propagateSql(
      srcCte: String,
      higherSpp: Int,
      lowerSpp: Int,
      method: AggregationMethod,
      xff: Double): String = {
    val total = lowerSpp / higherSpp
    val gate =
      if (xff <= 0.0) ""
      else s" HAVING CAST(CAST(count(*) AS DOUBLE) / $total AS FLOAT)" +
        s" >= CAST($xff AS FLOAT)"
    method match {
      case AggregationMethod.Last =>
        // value at the max finer bucket_ts per coarser bucket
        s"""SELECT metric, bucket_ts, value, known, CAST($total AS BIGINT) AS total FROM (
           |  SELECT metric, (bucket_ts // $lowerSpp) * $lowerSpp AS bucket_ts, value,
           |         row_number() OVER (PARTITION BY metric, (bucket_ts // $lowerSpp) * $lowerSpp
           |                            ORDER BY bucket_ts DESC) AS rn,
           |         count(*) OVER (PARTITION BY metric, (bucket_ts // $lowerSpp) * $lowerSpp) AS known
           |  FROM $srcCte) WHERE rn = 1
           |    AND CAST(CAST(known AS DOUBLE) / $total AS FLOAT) >= CAST($xff AS FLOAT)""".stripMargin
      case m =>
        val valueSql = m match {
          case AggregationMethod.AvgZero =>
            // grid-rounded at emission, as the Spark side (see propagate)
            Buckets.round6Sql(s"${fixedSumSql()} / $total")
          case AggregationMethod.Average =>
            Buckets.round6Sql(aggSql(m, s"$srcCte.bucket_ts"))
          case AggregationMethod.AbsMax | AggregationMethod.AbsMin =>
            // qualified ts: the outer SELECT aliases the coarser bucket
            // to the same name, the aggregate must order by the finer one
            absSql(m, s"$srcCte.bucket_ts")
          case simple => aggSql(simple, s"$srcCte.bucket_ts")
        }
        s"""SELECT metric, (bucket_ts // $lowerSpp) * $lowerSpp AS bucket_ts,
           |       $valueSql AS value, count(*) AS known,
           |       CAST($total AS BIGINT) AS total
           |FROM $srcCte GROUP BY 1, 2$gate""".stripMargin
    }
  }

  /** R3 ring-buffer retention expiry: keep only buckets inside the
    * archive's time span, relative to pinned "now" (reference: implicit
    * in whisper's `PointOffset` ring arithmetic; SURVEY.md §2.5 R3).
    */
  def retentionExpiry(level: DataFrame, retentionSeconds: Long, nowS: Long): DataFrame =
    level.filter(col("bucket_ts") >= nowS - retentionSeconds)
}
