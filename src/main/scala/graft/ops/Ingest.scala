package graft.ops

import graft.model.WhisperSchema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path operators (reference: whisper.go → `Update`, `UpdateMany`,
  * `alignPoints`, `extractPoints`; SURVEY.md §2.6 U1–U3, §2.2 F3).
  *
  * Whisper's write path is: route each incoming point to the finest
  * archive whose retention covers its age (U3), floor its timestamp to
  * that archive's resolution, and overwrite the slot — last write wins
  * (U2). This engine expresses the same as a batch dedup: one winner per
  * (metric, aligned bucket), standardized (SURVEY.md §7.4 risk 3) as
  * latest-raw-timestamp-wins with larger-value tiebreak — argmax under
  * the lexicographic key `(ts_s, value)`.
  *
  * Scale notes (100 TB): LWW dedup is an aggregation keyed on
  * (metric, bucket) — map-side partial max collapses duplicates before
  * the shuffle, so shuffle volume is bounded by distinct buckets, not
  * input rows. The argmax runs as [[graft.functions.LwwMax]] — the same
  * total order as `max_by(value, struct(ts_s, value))` over two
  * FLATTENED PRIMITIVE buffer slots, because the struct-buffered
  * `max_by`/`max(struct)` forms are not UnsafeRow-mutable and plan as
  * partial/final SortAggregate (two extra sorts on every ingest-shaped
  * query — the r12 `carbon_ingest` finding). With the flat buffer the
  * plan is codegen'd HashAggregate (PlanSpec pins the whole family). A
  * `row_number` window formulation would be worse still — it shuffles
  * and sorts ALL raw rows.
  */
object Ingest {

  import graft.functions.LwwMax.lwwMax

  /** U2 `alignPoints`: floor to the archive step and dedupe per interval,
    * last write wins. Input `(metric, ts_s, value)` → output
    * `(metric, bucket_ts, value)`.
    */
  def lwwAlign(pts: DataFrame, spp: Int): DataFrame =
    pts.groupBy(col("metric"), Buckets.alignTs(col("ts_s"), spp).as("bucket_ts"))
      .agg(lwwMax(col("ts_s"), col("value")).as("w"))
      .select(col("metric"), col("bucket_ts"), col("w.value").as("value"))

  /** [[lwwAlign]] that also keeps the winning point's RAW timestamp.
    * Needed wherever winners are merged with later arrivals (streaming
    * micro-batch state): re-deduping on the aligned floor instead of the
    * true raw ts would let micro-batch boundaries decide winners.
    */
  def lwwAlignKeepTs(pts: DataFrame, spp: Int): DataFrame =
    pts.groupBy(col("metric"), Buckets.alignTs(col("ts_s"), spp).as("bucket_ts"))
      .agg(lwwMax(col("ts_s"), col("value")).as("w"))
      .select(col("metric"), col("bucket_ts"),
        col("w.value").as("value"), col("w.ts_s").as("ts_s"))

  /** SQL-shape of [[lwwAlign]] as a DuckDB CTE body (row_number form —
    * identical winner to `max_by(value, struct(ts_s, value))`), over the
    * `from` point CTE (default the canonical `pts`).
    */
  def lwwAlignSql(spp: Int, from: String = "pts"): String =
    s"""SELECT metric, bucket_ts, value FROM (
       |  SELECT metric, (ts_s // $spp) * $spp AS bucket_ts, value,
       |         row_number() OVER (PARTITION BY metric, (ts_s // $spp) * $spp
       |                            ORDER BY ts_s DESC, value DESC) AS rn
       |  FROM $from) WHERE rn = 1""".stripMargin

  /** U3 archive selection as a routing column: 1-based index of the
    * finest archive whose retention strictly exceeds the point's age,
    * 0 = rejected (older than every archive, or future — F3).
    * Whisper iterates finest→coarsest and takes the first archive with
    * `age < maxRetention`; a CASE chain is the relational equivalent.
    */
  def archiveColumn(schema: WhisperSchema, nowS: Long): Column = {
    val age = lit(nowS) - col("ts_s")
    val routed = schema.retentions.zipWithIndex.foldRight(lit(0): Column) {
      case ((r, i), elseCol) =>
        when(age < r.maxRetentionSeconds, lit(i + 1)).otherwise(elseCol)
    }
    when(age < 0, lit(0)).otherwise(routed)
  }

  /** SQL-shape of [[archiveColumn]]. */
  def archiveColumnSql(schema: WhisperSchema, nowS: Long): String = {
    val arms = schema.retentions.zipWithIndex.map { case (r, i) =>
      s"WHEN $nowS - ts_s < ${r.maxRetentionSeconds} THEN ${i + 1}"
    }.mkString(" ")
    s"CASE WHEN $nowS - ts_s < 0 THEN 0 $arms ELSE 0 END"
  }

  /** F3 out-of-retention gate: label each point accepted/rejected against
    * the schema's max retention (whisper: "Timestamp not covered by any
    * archives in this database").
    */
  def retentionStatus(schema: WhisperSchema, nowS: Long): Column = {
    val age = lit(nowS) - col("ts_s")
    when(age >= 0 && age < schema.maxRetentionSeconds, lit("accepted"))
      .otherwise(lit("rejected"))
  }
}
