package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * (the caller's pinned `nowS` here — never the wall clock), and
  * malformed lines are DROPPED, not fatal (carbon logs and continues;
  * a 100 TB backfill must not die on one bad line). Use [[parsedStats]]
  * when the drop count must be observable.
  */
object Carbon {

  /** Parse a `text`-sourced frame (one `value` column of raw lines)
    * into points. Whitespace-tolerant; blank and malformed lines drop.
    */
  def parse(lines: DataFrame, nowS: Long): DataFrame = {
    // strip ALL whitespace at the edges, not just spaces: Spark's trim
    // is 0x20-only, so a leading tab or a CRLF file's trailing \r
    // would smuggle an empty split token past the arity gate and drop
    // a VALID line (carbon does line.strip())
    val f = split(regexp_replace(col("value"), "^\\s+|\\s+$", ""), "\\s+")
    lines
      .select(f.as("f"))
      .filter(size(col("f")) === 3)
      // try_cast, not cast: under ANSI a malformed number would ABORT
      // the scan — carbon's contract is drop-and-continue
      .select(col("f").getItem(0).as("metric"),
        expr("try_cast(f[2] AS BIGINT)").as("ts_raw"),
        expr("try_cast(f[1] AS DOUBLE)").as("value"))
      .filter(col("metric") =!= "" && col("ts_raw").isNotNull &&
        col("value").isNotNull)
      .select(col("metric"),
        when(col("ts_raw") === -1L, nowS).otherwise(col("ts_raw"))
          .as("ts_s"),
        col("value"))
  }

  /** Accepted points plus the dropped-line count — the observability a
    * lossy-but-tolerant ingest needs (one extra pass over the tiny
    * malformed remainder, not the accepted stream).
    */
  def parsedStats(lines: DataFrame, nowS: Long): (DataFrame, Long) = {
    val pts = parse(lines, nowS)
    val total = lines.filter(
      regexp_replace(col("value"), "^\\s+|\\s+$", "") =!= "").count()
    (pts, total - pts.count())
  }

  /** Serialize a points frame back to protocol lines (fixture/export
    * side; Java double→string round-trips exactly, so parse ∘ format
    * is the identity on values).
    */
  def format(points: DataFrame): DataFrame =
    points.select(concat_ws(" ",
      col("metric"), col("value").cast("string"),
      col("ts_s").cast("string")).as("value"))
}
