package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure aggregation logic of [[TopKAgg]] —
  * the contract `udaf` relies on: any partitioning of the input into
  * partial buffers, merged in any grouping, equals global
  * sort-by-(score desc, id)-take-k.
  */
object TopKAggProps extends Properties("TopKAgg") {

  private val itemGen: Gen[ScoredId] = for {
    id <- Gen.chooseNum(0L, 50L)
    score <- Gen.chooseNum(-5.0, 5.0)
  } yield ScoredId(id, score)

  private val itemsGen = Gen.listOf(itemGen)

  private def expected(items: List[ScoredId], k: Int): Seq[ScoredId] =
    items.sortBy(x => (-x.score, x.cand_id)).take(k)

  property("reduce-then-merge over any split equals global sort-take") =
    forAll(itemsGen, Gen.chooseNum(0, 100), Gen.chooseNum(1, 8)) {
      (items, splitPct, k) =>
        val agg = new TopKAgg(k)
        val at = items.size * splitPct / 100
        val (l, r) = items.splitAt(at)
        val bufL = l.foldLeft(agg.zero)(agg.reduce)
        val bufR = r.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(bufL, bufR)) == expected(items, k)
    }

  property("merge is commutative up to tie-identical elements") =
    forAll(itemsGen, itemsGen, Gen.chooseNum(1, 8)) { (a, b, k) =>
      val agg = new TopKAgg(k)
      val bufA = a.foldLeft(agg.zero)(agg.reduce)
      val bufB = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(bufA, bufB) == agg.merge(bufB, bufA)
    }

  property("buffer never exceeds k and stays sorted") =
    forAll(itemsGen, Gen.chooseNum(1, 8)) { (items, k) =>
      val agg = new TopKAgg(k)
      val buf = items.foldLeft(agg.zero)(agg.reduce)
      buf.size <= k &&
        buf.zip(buf.drop(1)).forall { case (x, y) =>
          x.score > y.score || (x.score == y.score && x.cand_id <= y.cand_id)
        }
    }
}
