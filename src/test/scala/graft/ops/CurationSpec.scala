package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the curation operators (sf0.001 — fast). */
class CurationSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dedup_collapse is a consistent corpus manifest") {
    val rows = Curation.dedupCollapse(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == total) // every document appears exactly once
    // cluster sizes are consistent and each cluster keeps exactly its min
    for ((cid, members) <- rows.groupBy(_._2)) {
      assert(members.forall(_._3 == members.length),
        s"cluster $cid n_members disagrees")
      assert(members.map(_._1).min == cid, s"cluster id $cid is not the min")
      assert(members.count(_._4 == 1) == 1 &&
        members.find(_._4 == 1).get._1 == cid,
        s"cluster $cid does not keep exactly its canonical doc")
    }
    // the kept set is one doc per cluster
    assert(rows.count(_._4 == 1) == rows.map(_._2).distinct.length)
    // agrees with dedup_cluster on clustered docs
    val cl = Dedup.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((doc, cid, _, _) <- rows if cl.contains(doc))
      assert(cl(doc) == cid)
  }

  test("decontaminate flags exactly the shingle-sharing corpus docs") {
    val rows = Curation.decontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // corpus docs only, each once
    assert(rows.forall(_._1 >= Curation.BenchmarkDocs))
    val total = spark.read.parquet(s"$dir/documents.parquet")
      .filter(s"doc_id >= ${Curation.BenchmarkDocs}").count()
    assert(rows.length == total)
    // flag is exactly n_shared > 0
    assert(rows.forall { case (_, n, f) => (n > 0) == (f == 1) })
    // a doc TEXT-identical to a benchmark doc must be flagged (exact dups
    // exist in testdata iff dedup_exact found groups spanning the cut)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "md5(text) AS h").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val benchHashes = docs.filter(_._1 < Curation.BenchmarkDocs).map(_._2).toSet
    val flagged = rows.filter(_._3 == 1).map(_._1).toSet
    for ((id, h) <- docs if id >= Curation.BenchmarkDocs && benchHashes(h))
      assert(flagged(id), s"doc $id duplicates a benchmark doc but is clean")
  }

  test("text_repetition features are in valid ranges") {
    val rows = Curation.textRepetition(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length == total)
    assert(rows.forall { case (_, n, top, dup) =>
      n > 0 && top > 0 && top <= 1.0 && dup >= 0.0 && dup <= 1.0
    })
    // n_tokens agrees with the quality op's token count
    val q = TextAnalysis.textQuality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.forall { case (id, n, _, _) => q(id).toLong == n })
  }

  test("curate composes its gates consistently and non-degenerately") {
    val rows = Curation.curate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6)))
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(s"doc_id >= ${Curation.BenchmarkDocs}").count()
    assert(rows.length == corpus) // a decision for every corpus doc
    // keep is exactly the conjunction of the three gates
    assert(rows.forall { case (_, _, d, c, q, k) =>
      k == (if (d == 1 && c == 1 && q == 1) 1 else 0)
    })
    // each gate and the conjunction is non-degenerate on this corpus
    assert(rows.exists(_._6 == 1) && rows.exists(_._6 == 0))
    assert(rows.exists(_._5 == 0), "quality gate drops nothing")
    // gates agree with their source operators
    val keepd = Curation.dedupCollapse(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    val clean = Curation.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 - r.getInt(2))).toMap
    assert(rows.forall { case (id, _, d, c, _, _) =>
      keepd(id) == d && clean(id) == c
    })
    // splits partition the kept set
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("split_assign partitions the corpus deterministically near 80/10/10") {
    val a = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val b = Curation.splitAssign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(a.sameElements(b)) // reproducible anywhere
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(a.length == total) // a partition: every doc in exactly one split
    assert(a.forall { case (_, bk, sp) =>
      sp == (if (bk < Curation.TrainCut) "train"
             else if (bk < Curation.ValCut) "val" else "test")
    })
    val frac = a.count(_._3 == "train").toDouble / a.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac implausible")
    // independence from the sampling hash: the salt actually changes
    // buckets (some sampled doc lands in a different split bucket)
    val sample = PipelineOps.sampleStratified(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](3).intValue()).toMap
    val splitBk = a.map { case (id, bk, _) => id -> bk }.toMap
    assert(sample.exists { case (id, bk) => splitBk(id) != bk })
  }

  test("split_assign_safe keeps every near-dup cluster in one split") {
    val safe = Curation.splitAssignSafe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val plain = Curation.splitAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(safe.length == plain.size) // still a partition of the corpus
    val clusters = Dedup.dedupCluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty) // the fixture must exercise the join
    // the leakage guarantee: one split per cluster
    safe.groupBy(_._2).foreach { case (g, members) =>
      assert(members.map(_._3).toSet.size == 1, s"cluster $g spans splits")
    }
    safe.foreach { case (id, g, sp) =>
      clusters.get(id) match {
        // singleton docs: identical assignment to split_assign
        case None => assert(g == id && sp == plain(id))
        // clustered docs: assignment of the component minimum
        case Some(c) => assert(g == c && sp == plain(c))
      }
    }
    // the guard is not vacuous: some clustered doc would have landed in
    // a DIFFERENT split under the per-doc hash
    assert(safe.exists { case (id, g, sp) => id != g && sp != plain(id) })
  }
}
