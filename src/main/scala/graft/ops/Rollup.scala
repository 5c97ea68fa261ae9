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
  /** Ordered left fold Σ value with addends SORTED BY (ts, value) — the
    * textEntropy order pin applied to the consolidation sums: an
    * unordered double sum's merge order varies with task timing and
    * differs from DuckDB's, and a window mean sitting on a
    * round-half-at-1e-6 boundary then flips the 6th decimal (the five
    * sf0.1 avg-family hash misses of r10). The collected array is the
    * consolidation window — schema-bounded (lowerSpp/higherSpp slots,
    * ≤60 for the std schemas) or emission-rate-bounded (raw points per
    * metric-hour), never corpus-proportional, so the shape holds at
    * 100 TB.
    */
  private def orderedSum(value: Column, ts: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(ts.as("t"), value.as("v")))),
        x => x.getField("v")),
      lit(0d), (a, v) => a + v)

  /** The matching DuckDB fold (list ORDER BY ts, value; left-assoc).
    * `v` names the value column (default the canonical `value`).
    */
  private[graft] def orderedSumSql(ts: String, v: String = "value"): String =
    s"list_reduce(list($v ORDER BY $ts, $v), (a, x) -> a + x)"

  /** The fully-pinned consolidation mean: ordered fold ÷ count, rounded
    * through [[Buckets.round6]] — every step IEEE-identical across
    * engines, so an avg output edge using this pair matches the oracle
    * EXACTLY at any scale factor (no round-6-absorption needed).
    */
  private[graft] def mean6(value: Column, ts: Column): Column =
    Buckets.round6(aggColumn(AggregationMethod.Average, value, ts))

  /** [[mean6]] in the oracle dialect. */
  private[graft] def mean6Sql(ts: String, v: String = "value"): String =
    Buckets.round6Sql(s"${orderedSumSql(ts, v)} / count($v)")

  /** [[mean6]] over a NULLABLE column (dense frames carry null gap
    * slots): nulls are dropped before the sort on the Spark side
    * (collect_list skips the null-guarded struct) and filtered out of
    * the ordered list on the oracle side, and an all-null group yields
    * NULL — exactly `avg`'s null contract, but with the fold order and
    * the rounding pinned. `key` must be unique within the group (e.g.
    * `struct(bucket_ts, metric)`) so both engines sort identically.
    */
  private[graft] def orderedMean6(value: Column, key: Column): Column = {
    val vals = transform(
      array_sort(collect_list(
        when(value.isNotNull, struct(key.as("k"), value.as("v"))))),
      x => x.getField("v"))
    when(count(value) > 0,
      Buckets.round6(aggregate(vals, lit(0d), (a, v) => a + v) / count(value)))
  }

  /** [[orderedMean6]] in the oracle dialect; `key` is a comma-joined
    * ORDER BY list (e.g. `"bucket_ts, metric"`).
    */
  private[graft] def orderedMean6Sql(key: String, v: String = "v"): String =
    s"CASE WHEN count($v) > 0 THEN ${Buckets.round6Sql(
      s"list_reduce(list_filter(list($v ORDER BY $key), x -> x IS NOT NULL)," +
        s" (a, x) -> a + x) / count($v)")} END"

  /** The bare ordered sum for caller-assembled quotients (e.g.
    * weightedAverage's Σ(v·w)/Σ(w)): same (key, value)-sorted left fold
    * as [[orderedSum]], exposed with a caller-chosen sort key. Inputs
    * must be non-null.
    */
  private[graft] def orderedSumBy(value: Column, key: Column): Column =
    orderedSum(value, key)

  def aggColumn(method: AggregationMethod, value: Column, ts: Column): Column =
    method match {
      case AggregationMethod.Average => orderedSum(value, ts) / count(value)
      case AggregationMethod.Sum     => orderedSum(value, ts)
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
      case AggregationMethod.AvgZero => orderedSum(value, ts) / max(totalSlots)
      case other                     => aggColumn(other, value, ts)
    }

  /** SQL-shape of [[aggColumn]] for the oracle dialect. `Last` uses the
    * window form (`row_number` over ts DESC) handled in [[propagateSql]];
    * `AbsMax`/`AbsMin` use DuckDB's ordered `array_agg` and `AvgZero`
    * interpolates the slot count — all three emitted in [[propagateSql]].
    */
  private def aggSql(method: AggregationMethod, ts: String): String =
    method match {
      case AggregationMethod.Average => s"${orderedSumSql(ts)} / count(value)"
      case AggregationMethod.Sum     => orderedSumSql(ts)
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
    level
      .groupBy(col("metric"), Buckets.alignTs(col("bucket_ts"), lowerSpp).as("bucket_ts"))
      .agg(
        aggColumn(method, col("value"), col("bucket_ts"),
          lit(total.toLong)).as("value"),
        count(lit(1)).as("known"))
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
            s"${orderedSumSql(s"$srcCte.bucket_ts")} / $total"
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
