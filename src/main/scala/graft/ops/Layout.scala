package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout optimization: Z-order (Morton) keys
  * over `(user_id, time)` and the range-partitioned rewrite that
  * clusters storage by them — the "OPTIMIZE ZORDER BY" primitive of
  * lakehouse table formats, as a plain Spark op.
  *
  * Why it matters at 100 TB: parquet row-group pruning works off
  * per-file/rowgroup min-max stats, which only prune on the FIRST sort
  * dimension of a lexicographic layout. Interleaving the bits of both
  * dimensions into one key makes files compact in EVERY interleaved
  * dimension at once, so a `user_id = ?` probe AND a time-range scan
  * both skip most files (LayoutSpec pins the per-file span shrink vs
  * the natural-order layout on both dimensions).
  *
  * The interleave is the standard staged spread ("Bit Twiddling Hacks",
  * public domain): each 16-bit dimension is spread to even bit
  * positions in four mask-and-shift steps, then the two spreads are
  * offset-OR'd. Pure per-row arithmetic — codegen'd, no shuffle for the
  * key itself; the REWRITE is one `repartitionByRange(z)` (range
  * exchange with a driver-sampled range map) + in-partition sort, the
  * same cost shape as any global sort-write.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30). */
  private def spread16(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(x) { case (c, (sh, mask)) =>
        shiftleft(c, sh).bitwiseOR(c).bitwiseAND(lit(mask))
      }

  /** Morton key of the two dimensions after MIN-MAX 16-bit quantization:
    * `q = ((v − min) · 2^16) div (max − min + 1)`. Normalizing by the
    * observed range (how production OPTIMIZE-ZORDER implementations
    * quantize too, via range sampling) is what makes the interleave
    * meaningful when the dimensions' raw bit-widths differ wildly — a
    * 4-bit user space against a 22-bit epoch span would otherwise sort
    * almost purely by time and cluster nothing (LayoutSpec caught
    * exactly that with the raw `mod 2^16` form). Exact integer
    * arithmetic throughout, so DuckDB reproduces it bit-for-bit.
    */
  private def zCol: Column = {
    // SQL `div`: EXACT integer division (a float divide + floor can land
    // one off an exact quotient and diverge from DuckDB's `//`)
    def q(v: String, lo: String, hi: String): Column =
      expr(s"(($v - $lo) * 65536) div ($hi - $lo + 1)")
    shiftleft(spread16(q("user_id", "umin", "umax")), 1)
      .bitwiseOR(spread16(q("ts_s", "tmin", "tmax")))
  }

  /** The per-dimension bounds, appended as a broadcast one-row frame —
    * the tiny "range sample" pass every z-order rewrite pays once.
    */
  private def withBounds(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(e.agg(
      min(col("user_id")).as("umin"), max(col("user_id")).as("umax"),
      min(col("ts_s")).as("tmin"), max(col("ts_s")).as("tmax"))))

  /** `zorder_key`: the Morton key per event — the deterministic
    * arithmetic the layout rewrite clusters by, oracle-checked
    * bit-for-bit against DuckDB's integer ops.
    */
  def zorderKey(s: SparkSession, dir: String): DataFrame =
    withBounds(Buckets.eventsRaw(s, dir))
      .select(col("event_id"), zCol.as("z"))
      .orderBy("event_id")

  val zorderKeySql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id,
       |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
       |  FROM events),
       |bounds AS (
       |  SELECT min(user_id) AS umin, max(user_id) AS umax,
       |         min(ts_s) AS tmin, max(ts_s) AS tmax FROM e),
       |q AS (
       |  SELECT event_id,
       |         ((user_id - umin) * 65536) // (umax - umin + 1) AS a,
       |         ((ts_s - tmin) * 65536) // (tmax - tmin + 1) AS b
       |  FROM e CROSS JOIN bounds),
       |s1 AS (SELECT event_id, ((a << 8) | a) & 16711935 AS a,
       |              ((b << 8) | b) & 16711935 AS b FROM q),
       |s2 AS (SELECT event_id, ((a << 4) | a) & 252645135 AS a,
       |              ((b << 4) | b) & 252645135 AS b FROM s1),
       |s3 AS (SELECT event_id, ((a << 2) | a) & 858993459 AS a,
       |              ((b << 2) | b) & 858993459 AS b FROM s2),
       |s4 AS (SELECT event_id, ((a << 1) | a) & 1431655765 AS a,
       |              ((b << 1) | b) & 1431655765 AS b FROM s3)
       |SELECT event_id, (a << 1) | b AS z FROM s4
       |ORDER BY event_id""".stripMargin

  /** The layout rewrite: cluster the events table into `nFiles` files by
    * Z-order — `repartitionByRange` samples the key distribution on the
    * driver and assigns contiguous z-ranges to partitions (so file
    * min-max spans never overlap), and the in-partition sort packs each
    * file's row groups tight. Returns the written frame's path.
    */
  def zorderWrite(s: SparkSession, dir: String, out: String,
      nFiles: Int): Unit =
    withBounds(Buckets.eventsRaw(s, dir))
      .withColumn("z", zCol)
      .drop("umin", "umax", "tmin", "tmax")
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(out)
}
