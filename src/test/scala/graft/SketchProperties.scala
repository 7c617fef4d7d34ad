package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.operators.{DdSketch, MisraGriesAgg}

/** Randomized laws for the sketch operators, exercised on the pure
  * functions (no Spark round trip per case) — the scalacheck complement
  * to DdSketchSpec/MisraGriesSpec's planted-data tests.
  */
object SketchProperties extends Properties("Sketches") {

  // ---- DDSketch: the bucket-midpoint relative-error bound is the whole
  // sketch's guarantee; check it pointwise over random positive doubles
  // and random gammas (the Spark-side bucket expression mirrors this
  // arithmetic exactly: ceil(ln x / ln gamma))
  private val genGamma = Gen.choose(1.005, 1.2)
  private val genValue = Gen.choose(1e-6, 1e9)

  property("DDSketch bucket midpoint within alpha of the value") =
    forAll(genValue, genGamma) { (v, gamma) =>
      val b = math.ceil(math.log(v) / math.log(gamma))
      val mid = 2.0 * math.pow(gamma, b) / (gamma + 1.0)
      math.abs(mid - v) / v <= DdSketch.alpha(gamma) + 1e-9
    }

  // ---- Misra-Gries: undercount-only within n/(k+1), guaranteed
  // heavy-hitter containment, on random streams and random k — single
  // stream and a random two-way split merged
  private val genStream: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.choose(0, 25).map(i => s"t$i"))
  private val genK = Gen.choose(1, 12)

  private def laws(stream: List[String], k: Int,
      estimates: Map[String, Long]): Boolean = {
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = stream.size.toLong / (k + 1)
    val within = estimates.forall { case (t, est) =>
      est <= exact(t) && exact(t) - est <= bound
    }
    val heaviesKept = exact.forall { case (t, c) =>
      c <= bound || estimates.contains(t)
    }
    within && heaviesKept && estimates.size <= k
  }

  property("MG single stream: undercount within n/(k+1), heavies kept") =
    forAll(genStream, genK) { (stream, k) =>
      val agg = new MisraGriesAgg(k)
      val buf = stream.foldLeft(agg.zero)(agg.reduce)
      laws(stream, k, agg.finish(buf).map(i => i.term -> i.est).toMap)
    }

  property("MG merged split keeps the bound (mergeable-summaries)") =
    forAll(genStream, genK, Gen.choose(0, 1000)) { (stream, k, cutRaw) =>
      val agg = new MisraGriesAgg(k)
      val (l, r) = stream.splitAt(cutRaw % (stream.size + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      merged.n == stream.size.toLong &&
        laws(stream, k, agg.finish(merged).map(i => i.term -> i.est).toMap)
    }
}
