package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: the Morton key arithmetic against a reference
  * bit-interleave, and the claim that matters — a z-clustered file
  * layout is compact in BOTH interleaved dimensions, where the natural
  * (time-ordered) layout is compact in one.
  */
class LayoutSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference interleave: bit i of a → bit 2i+1, bit i of b → bit 2i. */
  private def refZ(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zorder_key equals the bitwise reference interleave") {
    val raw = Buckets.eventsRaw(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = Layout.zorderKey(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(raw.nonEmpty)
    val (umin, umax) = (raw.map(_._2).min, raw.map(_._2).max)
    val (tmin, tmax) = (raw.map(_._3).min, raw.map(_._3).max)
    for ((id, u, ts) <- raw) {
      val qu = (u - umin) * 65536L / (umax - umin + 1)
      val qt = (ts - tmin) * 65536L / (tmax - tmin + 1)
      assert(got(id) == refZ(qu, qt), s"event $id")
    }
    // min-max quantization must actually use the 16-bit range for BOTH
    // dims, or the interleave degenerates to single-dimension order
    assert((umax - umin + 1) > 1 && (tmax - tmin + 1) > 1)
  }

  test("z-clustered files are compact in BOTH dimensions") {
    val out = Files.createTempDirectory("zorder").toString
    val nFiles = 8
    Layout.zorderWrite(spark, dir, s"$out/z", nFiles)
    // the comparison layout: the same file count in natural time order
    Buckets.eventsRaw(spark, dir)
      .repartitionByRange(nFiles, col("ts_s"))
      .sortWithinPartitions("ts_s")
      .write.mode("overwrite").parquet(s"$out/t")
    def spans(path: String): Seq[(Double, Double)] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("user_id")) - min(col("user_id")),
            max(col("ts_s")) - min(col("ts_s"))).collect().head
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
    }
    val z = spans(s"$out/z")
    val t = spans(s"$out/t")
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size
    val (zU, zT) = (mean(z.map(_._1)), mean(z.map(_._2)))
    val (tU, tT) = (mean(t.map(_._1)), mean(t.map(_._2)))
    // time-ordered files are tight in time but span the WHOLE user range;
    // z-ordered files must shrink the user span materially while keeping
    // the time span bounded (not the full epoch) — that is the pruning
    // win a (user_id = ?) probe gets from min-max stats
    assert(zU < tU * 0.8,
      s"z layout user span $zU not materially tighter than natural $tU")
    val fullT = Buckets.eventsRaw(spark, dir)
      .agg(max(col("ts_s")) - min(col("ts_s"))).collect().head.getLong(0)
    assert(zT < fullT,
      s"z layout time span $zT degenerated to the full range $fullT")
  }
}
