package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Mixture, Repetition}

/** Property invariants of the round-6 curation operators over random
  * inputs — the algebra that keeps the Gopher metrics and the
  * water-filling allocator trustworthy on corpora the hand cases never
  * see.
  */
object CurationProperties extends Properties("Curation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark =
    GraftSession.builder("curation-props", cores = 4).getOrCreate()

  private val genDocs: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 30).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf("aa", "bb", "cc", "dd", "e"))
          .map(_.mkString(" ")))))

  property("dup coverage is bounded by totals and shrinks as n grows") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def cov(n: Int) = Repetition.dupNgramCoverage(docs, "text", "doc_id", n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      val c2 = cov(2); val c3 = cov(3)
      // a repeated 3-gram's sub-2-grams repeat too and tile its span, so
      // every position covered at n=3 is covered at n=2: coverage is
      // monotone non-increasing in n
      c2.forall { case (id, (tot, cv)) =>
        cv <= tot && cv >= 0 && c3(id)._2 <= cv
      }
    }

  property("top-gram fraction is positive and count*len is exact mass") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = Repetition.topNgramFractions(docs, "text", "doc_id", Seq(2))
        .collect()
      rows.forall { r =>
        val cnt = r.getLong(3); val chars = r.getLong(4)
        val frac = r.getDouble(5)
        cnt >= 1 && chars >= 2 && frac > 0.0
      }
    }

  private val genAlloc: Gen[(List[(Long, Double)], Long)] = for {
    n <- Gen.chooseNum(1, 12)
    avails <- Gen.listOfN(n, Gen.chooseNum(1L, 500L))
    ws <- Gen.listOfN(n, Gen.chooseNum(1, 9).map(_.toDouble))
    budget <- Gen.chooseNum(0L, 3000L)
  } yield (avails.zip(ws), budget)

  property("waterfill: caps respected, budget conserved, level consistent") =
    Prop.forAll(genAlloc) { case (srcs, budget) =>
      import spark.implicits._
      val per = srcs.zipWithIndex
        .map { case ((a, w), i) => (f"s$i%03d", a, w) }
        .toDF("source", "avail", "w")
      val rows = Mixture.waterfill(per, "source", "avail", "w", budget)
        .collect()
        .map(r => (r.getLong(1), r.getDouble(3), r.getInt(4)))
      val totalAvail = srcs.map(_._1).sum
      val spent = rows.map(_._2).sum
      val want = math.min(budget, totalAvail).toDouble
      val capsOk = rows.forall { case (a, t, _) => t <= a + 1e-6 && t >= -1e-6 }
      // round6 on each uncapped allocation: tolerance scales with k
      val conserved = math.abs(spent - want) <= 1e-3 * (rows.length + 1)
      val cappedTakeAll = rows.forall { case (a, t, c) =>
        c == 0 || math.abs(t - a.toDouble) < 1e-9
      }
      capsOk && conserved && cappedTakeAll
    }
}
