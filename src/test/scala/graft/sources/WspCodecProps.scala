package graft.sources

import graft.model.{AggregationMethod, Retention, WhisperSchema}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure byte-level `.wsp` codec: header
  * round trip over random schemas, and ring-placement semantics (the
  * last lap's point owns each slot) over random aligned batches.
  */
object WspCodecProps extends Properties("WspCodec") {

  private val retGen: Gen[Retention] = for {
    spp <- Gen.chooseNum(1, 3600)
    n <- Gen.chooseNum(1, 500)
  } yield Retention(spp, n)

  /** Schemas built coarsest-multiple-of-finest so the 5-rule validator
    * passes: level i+1 = (spp·m, points enough to cover a longer span).
    */
  private val schemaGen: Gen[WhisperSchema] = for {
    r0 <- retGen
    mult <- Gen.chooseNum(2, 6) // bounded so spans stay inside the
    levels <- Gen.chooseNum(1, 3) // format's u32 maxRetention field
    method <- Gen.oneOf(AggregationMethod.all)
    xff <- Gen.chooseNum(0, 100)
  } yield {
    // rule 5: every finer archive must hold >= one consolidation window
    // (mult) of the next coarser one
    val first = Retention(r0.secondsPerPoint,
      math.max(r0.numberOfPoints, mult))
    val rets = (0 until levels).scanLeft(first) { (prev, _) =>
      Retention(prev.secondsPerPoint * mult,
        math.max(prev.numberOfPoints, mult) * 2)
    }
    WhisperSchema(rets, method, xff / 100.0)
  }

  property("header round-trips through the binary layout") =
    forAll(schemaGen) { schema =>
      val h = WspCodec.readHeader(WspCodec.emptyFile(schema))
      h.aggregationType == schema.method.id &&
        h.maxRetention == schema.maxRetentionSeconds &&
        math.abs(h.xFilesFactor - schema.xFilesFactor) < 1e-6 &&
        h.archives.map(a => (a.secondsPerPoint, a.numberOfPoints)) ==
          schema.retentions.map(r => (r.secondsPerPoint, r.numberOfPoints))
    }

  property("archiveCount reads the count from the 16-byte metadata alone") =
    forAll(schemaGen) { schema =>
      val meta = java.util.Arrays.copyOf(
        WspCodec.emptyFile(schema), WspCodec.MetadataSize)
      WspCodec.archiveCount(meta) == schema.retentions.size
    }

  /** Batches of aligned (interval, value) points starting at a random
    * base, spanning up to 3 ring laps.
    */
  private val batchGen: Gen[(Retention, Seq[(Long, Double)])] = for {
    r <- retGen
    base <- Gen.chooseNum(1L, 1000000L)
    offs <- Gen.nonEmptyListOf(Gen.chooseNum(0, r.numberOfPoints * 3))
  } yield {
    val spp = r.secondsPerPoint
    val b = base * spp // aligned, > 0 so no point collides with "empty"
    (r, offs.distinct.map(o => (b + o.toLong * spp, o.toDouble)))
  }

  property("decode returns exactly the last lap's point per slot") =
    forAll(batchGen) { case (r, pts) =>
      val schema = WhisperSchema(Seq(r), AggregationMethod.Last, 0.0)
      val file = WspCodec.emptyFile(schema)
      WspCodec.writeArchive(file, WspCodec.archiveInfos(schema).head, pts)
      val got = WspCodec.decodePoints(file)
        .map(p => p.tsS -> p.value).toMap
      val base = pts.map(_._1).min
      // reference semantics: slot = floorMod((i-base)/spp, N); writes
      // applied in time order, so per slot the max interval wins
      val expected = pts
        .groupBy { case (i, _) =>
          java.lang.Math.floorMod(
            (i - base) / r.secondsPerPoint, r.numberOfPoints.toLong)
        }
        .values.map(_.maxBy(_._1)).map(p => p._1 -> p._2).toMap
      got == expected
    }
}
