package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.{CountMin, Hll}

/** Invariants of the md5-deterministic sketches over random key multisets —
  * pure JVM properties (no Spark session needed): the algebra that makes
  * them safe to combine map-side in any partitioning.
  */
object SketchProperties extends Properties("Sketches") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val genKeys: Gen[List[String]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 60).map(i => s"k$i")))

  private def cmOf(keys: Seq[String], agg: CountMin) =
    keys.foldLeft(agg.zero)(agg.reduce)

  private def hllOf(keys: Seq[String], agg: Hll) =
    keys.foldLeft(agg.zero)(agg.reduce)

  property("CM merge is associative and agrees with the one-pass sketch") =
    Prop.forAll(genKeys, Gen.choose(0, 300)) { (keys, cut0) =>
      val agg = new CountMin(3, 32)
      val cut = math.min(cut0, keys.length)
      val (l, r) = keys.splitAt(cut)
      val merged = agg.merge(cmOf(l, agg), cmOf(r, agg))
      merged.toSeq == cmOf(keys, agg).toSeq
    }

  property("CM estimates never undercount any key") =
    Prop.forAll(genKeys) { keys =>
      val agg = new CountMin(3, 32)
      val sk = cmOf(keys, agg)
      val exact = keys.groupBy(identity).view.mapValues(_.size).toMap
      exact.forall { case (k, n) =>
        val base = CountMin.base32(k)
        (0 until 3).map(i => sk(i * 32 + CountMin.cell(base, i, 32))).min >= n
      }
    }

  property("CM total mass per row equals the input size") =
    Prop.forAll(genKeys) { keys =>
      val sk = cmOf(keys, new CountMin(3, 32))
      (0 until 3).forall(i =>
        sk.slice(i * 32, (i + 1) * 32).sum == keys.length.toLong)
    }

  property("HLL merge == sketch of the concatenation, in any split") =
    Prop.forAll(genKeys, Gen.choose(0, 300)) { (keys, cut0) =>
      val agg = new Hll
      val cut = math.min(cut0, keys.length)
      val (l, r) = keys.splitAt(cut)
      agg.merge(hllOf(l, agg), hllOf(r, agg)).toSeq ==
        hllOf(keys, agg).toSeq
    }

  property("HLL is insensitive to duplication and order") =
    Prop.forAll(genKeys) { keys =>
      val agg = new Hll
      val dup = keys ++ keys.reverse ++ keys
      Hll.estimate(hllOf(dup, agg)) == Hll.estimate(hllOf(keys, agg))
    }

  property("HLL estimate within 35% of exact in the <=61-key regime") =
    Prop.forAll(genKeys.suchThat(_.nonEmpty)) { keys =>
      val est = Hll.estimate(hllOf(keys, new Hll))
      val exact = keys.distinct.size.toDouble
      // m=64 linear-counting regime: generous bound, zero flake budget
      math.abs(est - exact) / exact <= 0.35
    }
}
