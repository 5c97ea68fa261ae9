package graft.sources

import graft.ops.{Buckets, Dedup, Ingest}
import graft.model.Retentions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked query over the `.wsp` binary path: parquet points →
  * LWW-aligned level → [[WspWrite]] `.wsp` files → [[WspDataSource]]
  * scan. The DuckDB oracle computes the same level directly from
  * parquet, so a hash match proves the byte-level encode → ring place →
  * decode → DSv2 scan pipeline is lossless (float64 values round-trip
  * bit-exactly through the format — whisper stores f64).
  */
object WspQueries {

  import Buckets.{NowS, pointsSql}

  /** 1m:1d ring (1440 slots), Last/LWW — the `lww` fixture schema. The
    * window [now−1d, now) holds exactly 1440 distinct 1m buckets, so
    * every aligned point owns a unique slot: write-side collisions
    * (ring laps) are exercised separately in WspSpec, where an oracle
    * cannot see them (DuckDB has no ring).
    */
  private val schema = Retentions.lww
  private val FromB = NowS - 86400L

  private val exported = new scala.collection.concurrent.TrieMap[String, Boolean]

  /** Export root — freshness-keyed like the other shared indexes, so a
    * regenerated testdata dir gets new files, not a stale read. */
  private def wspBase(s: SparkSession, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_wsp_" +
      s"${Dedup.freshDigest(s, dir, "events.parquet")}_p${Dedup.jvmTag}"

  /** `wsp_roundtrip`: write the 1m LWW level of the last retention day
    * as one `.wsp` file per metric, scan the tree back through
    * `format("wsp")`, and emit the canonical (metric, bucket_ts, value)
    * frame the oracle derives relationally.
    */
  def wspRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = wspBase(s, dir)
    exported.getOrElseUpdate(base, {
      val level = Ingest.lwwAlign(Buckets.points(s, dir), 60)
        .filter(col("bucket_ts") >= FromB && col("bucket_ts") < NowS)
      WspWrite.exportLevel(level, base, schema)
      true
    })
    s.read.format("wsp").load(base)
      .select(col("metric"), col("ts_s").as("bucket_ts"),
        round(col("value"), 6).as("value"))
      .orderBy("metric", "bucket_ts")
  }

  val wspRoundtripSql: String =
    s"""WITH $pointsSql,
       |lww1m AS (${Ingest.lwwAlignSql(60)})
       |SELECT metric, bucket_ts, round(value, 6) AS value FROM lww1m
       |WHERE bucket_ts >= $FromB AND bucket_ts < $NowS
       |ORDER BY metric, bucket_ts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wsp_roundtrip" -> (wspRoundtrip _))

  val oracleSql: Map[String, String] = Map(
    "wsp_roundtrip" -> wspRoundtripSql)
}
