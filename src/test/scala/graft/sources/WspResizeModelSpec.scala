package graft.sources

import graft.model.{AggregationMethod, Retention, WhisperSchema}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Model-based check of the resize routing: `WspTools.rederive` (the
  * relational banded plan — per-band filters, propagate hops,
  * pass-throughs) compared against an INDEPENDENT per-bucket reference
  * model that walks every target bucket and applies whisper's fetch
  * rule directly: serve the bucket from the finest source archive whose
  * live window overlaps it, aggregate that archive's live points inside
  * the bucket, gate on xff. Seeded-random trees include STALE ring
  * content (one lap older than the live window) that the fetch rule
  * must read as gaps, multi-metric files, and target levels coarser
  * than, equal to, and finer than the source archives.
  */
class WspResizeModelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Reference model: every (level, metric, bucket) decided on its own. */
  private def model(
      pointsByArchive: Map[Int, Seq[(String, Long, Double)]],
      srcRets: Seq[Retention],
      newSchema: WhisperSchema,
      nowS: Long): Set[(Int, String, Long, Double)] = {
    val out = Set.newBuilder[(Int, String, Long, Double)]
    val metrics = pointsByArchive.values.flatten.map(_._1).toSet
    newSchema.retentions.zipWithIndex.foreach { case (r, i) =>
      val sppL = r.secondsPerPoint.toLong
      val h = r.maxRetentionSeconds
      val first = math.ceil((nowS - h).toDouble / sppL).toLong * sppL
      (first until nowS by sppL).foreach { b =>
        // finest archive whose live window [nowS - ret_j, nowS) overlaps
        // [b, b + sppL)
        val j = srcRets.indexWhere(rj => b + sppL > nowS - rj.maxRetentionSeconds)
        if (j >= 0) {
          val retJ = srcRets(j).maxRetentionSeconds
          val sppJ = srcRets(j).secondsPerPoint.toLong
          metrics.foreach { m =>
            val live = pointsByArchive.getOrElse(j, Nil).filter { case (pm, ts, _) =>
              pm == m && ts >= nowS - retJ && ts < nowS && ts >= b && ts < b + sppL
            }
            if (live.nonEmpty) {
              if (sppL > sppJ) {
                // consolidation band: aggregate + xff gate
                val total = sppL / sppJ
                val gateOk = (live.size.toDouble / total).toFloat >=
                  newSchema.xFilesFactor.toFloat
                if (gateOk) {
                  val vs = live.map(_._3)
                  val v = newSchema.method match {
                    case AggregationMethod.Average => vs.sum / vs.size
                    case AggregationMethod.Sum => vs.sum
                    case AggregationMethod.Last => live.maxBy(_._2)._3
                    case AggregationMethod.Max => vs.max
                    case AggregationMethod.Min => vs.min
                    case AggregationMethod.AvgZero => vs.sum / total
                    case AggregationMethod.AbsMax =>
                      live.sortBy { case (_, ts, pv) =>
                        (-math.abs(pv), ts, pv) }.head._3
                    case AggregationMethod.AbsMin =>
                      live.sortBy { case (_, ts, pv) =>
                        (math.abs(pv), ts, pv) }.head._3
                  }
                  out += ((i, m, b, v))
                }
              } else {
                // copy / pass-through band: points at their own aligned ts
                live.foreach { case (_, ts, v) => out += ((i, m, ts, v)) }
              }
            }
          }
        }
      }
    }
    out.result()
  }

  test("rederive matches the per-bucket fetch-rule model on random trees") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 10) {
      // --- random source geometry: 1-3 archives, chained multiples
      val spp0 = Seq(1, 2, 5, 10)(rnd.nextInt(4))
      val nLevels = 1 + rnd.nextInt(3)
      val srcRets = (0 until nLevels).scanLeft(
          Retention(spp0, 4 + rnd.nextInt(5))) { (prev, _) =>
          val m = 2 + rnd.nextInt(3)
          Retention(prev.secondsPerPoint * m,
            math.max(4, prev.numberOfPoints / 2 + rnd.nextInt(4)) * 2)
        }.take(nLevels)
      // whisper rule 2/3 compliance is by construction (chained multiples,
      // growing spans); build the source schema for the export header
      val srcSchema = WhisperSchema(srcRets, AggregationMethod.Sum, 0.0)
      val nowS = 1000000L + rnd.nextInt(1000) * spp0.toLong
      // --- random ring content: live slots (p=.5) + stale one-lap-back
      // points in slots whose live counterpart is absent (p=.3)
      val metrics = Seq("aa", "bb").take(1 + rnd.nextInt(2))
      val pointsByArchive = srcRets.zipWithIndex.map { case (r, j) =>
        val spp = r.secondsPerPoint.toLong
        val ret = r.maxRetentionSeconds
        val pts = metrics.flatMap { m =>
          // whisper intervals are ABSOLUTE-grid aligned (ts mod spp == 0)
          val first = math.ceil((nowS - ret).toDouble / spp).toLong * spp
          val liveBuckets = (first until nowS by spp).toSeq
          val (taken, free) = liveBuckets.partition(_ => rnd.nextDouble() < 0.5)
          val stale = free.filter(_ => rnd.nextDouble() < 0.3).map(_ - ret)
          // signed small integers: sums/averages stay float-exact for the
          // set compare, and signs exercise the absmax/absmin tiebreaks
          (taken ++ stale).map { ts =>
            val mag = (1 + rnd.nextInt(99)).toDouble
            (m, ts, if (rnd.nextBoolean()) mag else -mag)
          }
        }
        j -> pts
      }.toMap
      val rows = pointsByArchive.toSeq.flatMap { case (j, pts) =>
        pts.map { case (m, ts, v) => (m, j, ts, v) }
      }
      if (rows.nonEmpty) {
        val tree = Files.createTempDirectory(s"resize_model_$trial").toString
        WspWrite.export(rows.toDF("metric", "archive", "bucket_ts", "value"),
          tree, srcSchema)
        // --- random target: 1-2 levels; spp a multiple of the coarsest
        // source spp, one of the source spps, or a divisor of the finest
        val coarsest = srcRets.last.secondsPerPoint
        def targetSpp(): Int = rnd.nextInt(3) match {
          case 0 => coarsest * (1 + rnd.nextInt(4))
          case 1 => srcRets(rnd.nextInt(srcRets.size)).secondsPerPoint
          case _ =>
            val divs = (1 to spp0).filter(spp0 % _ == 0)
            divs(rnd.nextInt(divs.size))
        }
        val tgtRets =
          if (rnd.nextBoolean()) Seq(Retention(targetSpp(), 3 + rnd.nextInt(8)))
          else {
            // two levels: the coarser is lcm(spp1, coarsest)·k — a
            // multiple of both spp1 (whisper rule 3) and every source
            // spp (resize alignment); finer holds >= one consolidation
            // window and the coarser reaches further back (rules 4/5)
            val spp1 = targetSpp()
            @annotation.tailrec def gcd(a: Int, b: Int): Int =
              if (b == 0) a else gcd(b, a % b)
            val lcm = spp1 / gcd(spp1, coarsest) * coarsest
            val spp2 = {
              val cand = lcm * (1 + rnd.nextInt(2))
              if (cand == spp1) cand * 2 else cand // rule 2: strictly coarser
            }
            val mEff = spp2 / spp1
            val t0 = Retention(spp1, math.max(3 + rnd.nextInt(8), mEff))
            Seq(t0, Retention(spp2,
              t0.secondsPerPoint * t0.numberOfPoints / spp2 + 1 + rnd.nextInt(5)))
          }
        val method = AggregationMethod.all(rnd.nextInt(AggregationMethod.all.size))
        val xff = Seq(0.0, 0.0, 0.5)(rnd.nextInt(3))
        val newSchema = WhisperSchema(tgtRets, method, xff)

        val got = WspTools.rederive(spark, tree, newSchema, nowS)
          .select("archive", "metric", "bucket_ts", "value").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
          .toSet
        val want = model(pointsByArchive, srcRets, newSchema, nowS)
        assert(got == want,
          s"""trial $trial mismatch
             |src=$srcRets now=$nowS tgt=$tgtRets method=$method xff=$xff
             |only_spark=${(got -- want).toSeq.sortBy(t => (t._1, t._2, t._3))}
             |only_model=${(want -- got).toSeq.sortBy(t => (t._1, t._2, t._3))}""".stripMargin)
      }
    }
  }
}
