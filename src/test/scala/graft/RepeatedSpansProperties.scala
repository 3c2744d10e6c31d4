package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.RepeatedSpans

/** Invariants of the span statistics over random small-vocabulary
  * corpora (tiny alphabet → plenty of genuine cross-document repeats):
  * coverage and span counts must satisfy the interval-merge arithmetic
  * for ANY input, complementing the crafted-phrase spec and the
  * sf-scale oracle.
  */
object RepeatedSpansProperties extends Properties("RepeatedSpans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark =
    GraftSession.builder("span-props", cores = 4).getOrCreate()

  private val n = 3 // span width under test

  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))

  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(2, 12).flatMap(k => Gen.listOfN(k, genDoc))

  property("coverage and span counts obey interval-merge arithmetic") =
    Prop.forAll(genCorpus) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = RepeatedSpans
        .spanStats(df, "text", "doc_id", n = n, minCount = 2)
        .collect()
      rows.length == docs.length && rows.forall { r =>
        val (nt, flagged, spans, covered) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        val frac = Option(r.get(5)).map(_.asInstanceOf[Double])
        covered <= nt &&
          spans <= flagged &&
          (flagged == 0) == (spans == 0) &&
          (flagged == 0) == (covered == 0) &&
          // a region of k flagged positions covers at least k + n − 1
          // tokens (consecutive positions) and at most k·n (positions
          // spaced exactly n apart — the widest spacing that still
          // merges); regions are disjoint, so the bounds sum
          covered >= flagged + spans * (n - 1) &&
          covered <= flagged * n &&
          covered >= spans * n &&
          (if (nt == 0) frac.isEmpty
           else frac.exists(f => f >= 0.0 && f <= 1.0))
      }
    }

  property("duplicating every document makes all full-width docs fully covered") =
    Prop.forAll(genCorpus) { docs =>
      import spark.implicits._
      // two copies of each doc → every shingle's multiplicity >= 2
      val df = (docs ++ docs).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = RepeatedSpans
        .spanStats(df, "text", "doc_id", n = n, minCount = 2)
        .collect()
      rows.forall { r =>
        val (nt, covered) = (r.getLong(1), r.getLong(4))
        nt < n || covered == nt // every position flagged → full coverage
      }
    }
}
