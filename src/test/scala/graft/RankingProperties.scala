package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.eval.{RankingAggregator, RankingBuf}

/** ScalaCheck laws for the RankingAggregator, exercised on the pure
  * reduce/merge/finish functions (no Spark round trip per case).
  */
object RankingProperties extends Properties("RankingAggregator") {

  private val agg = new RankingAggregator(5)

  // pred is DISTINCT: a ranking is a list of distinct items (the
  // aggregator's documented domain — mllib-parity MAP legitimately
  // exceeds 1 on duplicate hits, which scalacheck found when this
  // generator still allowed duplicates: pred=(21,21), truth=(21))
  private val genPair: Gen[(Seq[Int], Seq[Int])] = for {
    pred <- Gen.listOfN(10, Gen.choose(0, 30)).map(_.distinct)
    truth <- Gen.listOf(Gen.choose(0, 30)).map(_.distinct)
  } yield (pred, truth)

  private val genPairs: Gen[List[(Seq[Int], Seq[Int])]] =
    Gen.nonEmptyListOf(genPair)

  private def eval(pairs: Seq[(Seq[Int], Seq[Int])]) =
    agg.finish(pairs.foldLeft(agg.zero)(agg.reduce))

  property("metrics bounded in [0,1]") = forAll(genPairs) { pairs =>
    val m = eval(pairs)
    Seq(m.meanAveragePrecision, m.precisionAtK, m.ndcgAtK)
      .forall(v => v >= 0.0 && v <= 1.0) && m.users == pairs.length
  }

  property("merge is commutative") = forAll(genPairs, genPairs) { (a, b) =>
    val ba = a.foldLeft(agg.zero)(agg.reduce)
    val bb = b.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.finish(agg.merge(ba, bb))
    val m2 = agg.finish(agg.merge(bb, ba))
    math.abs(m1.meanAveragePrecision - m2.meanAveragePrecision) < 1e-12 &&
      math.abs(m1.ndcgAtK - m2.ndcgAtK) < 1e-12 && m1.users == m2.users
  }

  property("partition split is irrelevant (partial-agg correctness)") =
    forAll(genPairs, Gen.choose(0, 100)) { (pairs, cut) =>
      val (l, r) = pairs.splitAt(cut % (pairs.length + 1))
      val split = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val whole = eval(pairs)
      math.abs(split.meanAveragePrecision - whole.meanAveragePrecision) < 1e-12 &&
        math.abs(split.precisionAtK - whole.precisionAtK) < 1e-12
    }

  property("appending non-relevant items past k preserves P@k and NDCG@k") =
    forAll(genPair) { case (pred, truth) =>
      val noise = Seq(900, 901, 902) // disjoint from 0..30
      val a = eval(Seq((pred, truth)))
      val b = eval(Seq((pred ++ noise, truth)))
      math.abs(a.precisionAtK - b.precisionAtK) < 1e-12 &&
        math.abs(a.ndcgAtK - b.ndcgAtK) < 1e-12
    }

  property("perfect short ranking scores 1 on all metrics") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 1000)).map(_.distinct.take(5))) { ids =>
      if (ids.isEmpty) Prop.passed
      else {
        val m = eval(Seq((ids, ids)))
        Prop(math.abs(m.meanAveragePrecision - 1.0) < 1e-12 &&
          math.abs(m.ndcgAtK - 1.0) < 1e-12)
      }
    }

  property("P@k counts at most k predictions") = forAll(genPair) {
    case (pred, truth) =>
      val m = eval(Seq((pred, truth)))
      val hits = pred.take(5).count(truth.toSet)
      truth.isEmpty || math.abs(m.precisionAtK - hits / 5.0) < 1e-12
  }
}
