package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Approximation QUALITY gate for the ANN serving path: the oracle keys
  * prove the IVF plans compute their own definition correctly, but a
  * coarse quantizer can be correct and useless — this spec pins
  * recall@k against the brute-force ground truth, so a regression in
  * cell assignment or probe selection fails loudly even though every
  * hash still matches.
  */
class AnnRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF and trained-kmeans ANN keep usable recall@k vs brute force") {
    val exact = pairs(Similarity.similarityTopk(spark, dir))
    assert(exact.nonEmpty)
    val ivf = pairs(Similarity.similarityAnnIvf(spark, dir))
    val km = pairs(Similarity.similarityAnnKmeans(spark, dir))
    val rIvf = (ivf intersect exact).size.toDouble / exact.size
    val rKm = (km intersect exact).size.toDouble / exact.size
    info(f"recall@k ivf=$rIvf%.3f kmeans=$rKm%.3f")
    // measured 0.58 / 0.58 at sf0.001 with nprobe=4 — gate well below
    // the measurement but far above what a broken quantizer produces
    assert(rIvf >= 0.45, f"seed-codebook IVF recall degraded: $rIvf%.3f")
    assert(rKm >= 0.45, f"trained IVF recall degraded: $rKm%.3f")
  }

  test("PQ ANN keeps usable recall@k vs brute force") {
    val exact = pairs(Similarity.similarityTopk(spark, dir))
    val pq = pairs(Similarity.similarityAnnPq(spark, dir))
    val r = (pq intersect exact).size.toDouble / exact.size
    info(f"recall@k pq=$r%.3f")
    // measured 0.46 with shortlist=50 (10% of the 500-vector corpus;
    // a random shortlist gets ~0.10) — gate below the measurement, far
    // above what a broken codebook/ADC pass produces
    assert(r >= 0.35, f"PQ recall degraded: $r%.3f")
  }

  test("SRP-LSH ANN keeps usable recall@k vs brute force") {
    val exact = pairs(Similarity.similarityTopk(spark, dir))
    val srp = pairs(Similarity.similarityAnnSrp(spark, dir))
    val r = (srp intersect exact).size.toDouble / exact.size
    info(f"recall@k srp=$r%.3f")
    // measured 0.46 at sf0.001 with 4 bands × 4 bits over 64-dim
    // pseudo-random vectors (the hardest case for angle-LSH: true
    // neighbors are barely closer than noise) — gate below the
    // measurement, far above a broken signature's level
    assert(r >= 0.30, f"SRP recall degraded: $r%.3f")
  }

  test("multi-probe SRP dominates exact-band SRP and reaches high recall") {
    val exact = pairs(Similarity.similarityTopk(spark, dir))
    val srp = pairs(Similarity.similarityAnnSrp(spark, dir))
    val prb = pairs(Similarity.similarityAnnSrpProbe(spark, dir))
    val rS = (srp intersect exact).size.toDouble / exact.size
    val rP = (prb intersect exact).size.toDouble / exact.size
    info(f"recall@k srp=$rS%.3f probe=$rP%.3f")
    // the Hamming-1 probes can only ADD candidates, so probe recall
    // dominates by construction; measured 0.46 → 0.98 at sf0.001 —
    // gate well below the measurement but far above the exact-band form
    assert(rP >= rS, f"probing lost recall: $rP%.3f < $rS%.3f")
    assert(rP >= 0.80, f"multi-probe SRP recall degraded: $rP%.3f")
  }

  test("ann_nprobe_sweep: recall/cost monotone, exhaustive arm exact") {
    val rows = Similarity.annNprobeSweep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Similarity.SweepNProbes)
    // more probed clusters can only ADD candidates and hits
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 })
    // nprobe = NumCentroids scans every cluster: recall 1.0 BY
    // CONSTRUCTION (the arm's candidate set IS the brute-force set) —
    // a failure here means the sweep's ground truth diverged from its
    // own lattice
    assert(rows.last._4 == 1.0, s"exhaustive arm recall ${rows.last._4}")
    // and the curve actually discriminates on this fixture
    assert(rows.head._4 < 1.0)
    // hits bounded by the possible total
    assert(rows.forall(_._3 <= Similarity.NumQueries.toLong * Similarity.TopK))
  }

  test("ann_shortlist_sweep: recall/cost monotone, arms sized exactly") {
    val rows = Similarity.annShortlistSweep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Similarity.SweepShortlists)
    // a larger shortlist can only ADD re-rank candidates and hits
    assert(rows.sliding(2).forall { case Array(a, b) =>
      b._2 >= a._2 && b._3 >= a._3 && b._4 >= a._4 })
    // arm S re-ranks exactly min(S, corpus−1) candidates per query
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.forall(r =>
      r._2 == math.min(r._1.toLong, n - 1) * Similarity.NumQueries))
    // the curve discriminates on this fixture, and the committed
    // PqShortlist operating point sits on it
    assert(rows.head._4 < rows.last._4)
    assert(rows.map(_._1).contains(Similarity.PqShortlist))
    assert(rows.forall(_._3 <= Similarity.NumQueries.toLong * Similarity.TopK))
  }
}
