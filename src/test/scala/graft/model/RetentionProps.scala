package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** ScalaCheck properties for the pure config layer (SURVEY.md §5.2). */
object RetentionProps extends Properties("Retention") {

  private val sppGen = Gen.chooseNum(1, 100000)
  private val pointsGen = Gen.chooseNum(1, 1000000)
  private val tsGen = Gen.chooseNum(0L, 4102444800L) // ..2100

  property("parseRetentionDef round-trips seconds:count form") =
    forAll(sppGen, pointsGen) { (spp, pts) =>
      Retentions.parseRetentionDef(s"${spp}s:$pts") == Retention(spp, pts)
    }

  property("parseRetentionDef duration form divides out the precision") =
    forAll(Gen.chooseNum(1, 1000), Gen.chooseNum(1, 365)) { (mins, days) =>
      val expected = days.toLong * 86400 / (mins.toLong * 60)
      (days.toLong * 86400 % (mins * 60) == 0) ==> Prop(
        Retentions.parseRetentionDef(s"${mins}m:${days}d") ==
          Retention(mins * 60, expected.toInt))
    }

  property("align is a flooring projection onto the archive grid") =
    forAll(sppGen, tsGen) { (spp, ts) =>
      val r = Retention(spp, 10)
      val a = r.align(ts)
      a <= ts && ts - a < spp && a % spp == 0 && r.align(a) == a
    }

  property("fetchInterval is the strictly-next grid point (trap 1)") =
    forAll(Gen.chooseNum(1, 100000), tsGen) { (spp, ts) =>
      val fi = graft.ops.Buckets.fetchInterval(ts, spp)
      fi > ts && fi - ts <= spp && fi % spp == 0
    }

  property("archiveFor is monotone in age and bounded by the archive list") =
    forAll(Gen.chooseNum(0L, 4000000L), Gen.chooseNum(0L, 4000000L)) { (a1, a2) =>
      val s = Retentions.std
      val (lo, hi) = (math.min(a1, a2), math.max(a1, a2))
      (s.archiveFor(lo), s.archiveFor(hi)) match {
        case (Some(i), Some(j)) => i <= j
        case (None, Some(_))    => false // older age cannot gain coverage
        case _                  => true
      }
    }

  property("validate accepts any chain of doubling archives") =
    forAll(Gen.chooseNum(1, 60), Gen.chooseNum(2, 5)) { (baseSpp, n) =>
      // spp doubles each level; spans grow 4x -> all five rules hold
      val rs = (0 until n).map(i =>
        Retention(baseSpp << i, 100 << i))
      Retentions.validate(rs) == rs
    }

  property("validate rejects any coarser-before-finer transposition") =
    forAll(Gen.chooseNum(1, 60)) { baseSpp =>
      val rs = Seq(Retention(baseSpp * 2, 400), Retention(baseSpp, 100))
      Prop.throws(classOf[IllegalArgumentException])(Retentions.validate(rs))
    }
}
