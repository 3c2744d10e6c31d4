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

  private val genStrata: Gen[(Map[String, Int], String)] = for {
    k <- Gen.chooseNum(1, 5)
    sizes <- Gen.listOfN(k, Gen.chooseNum(1, 60))
    seed <- Gen.identifier.map(_.take(6))
  } yield (sizes.zipWithIndex.map { case (n, i) => s"L$i" -> n }.toMap, seed)

  property("stratifiedExactSplit: every cell holds exactly its ceil share") =
    Prop.forAll(genStrata) { case (sizes, seed) =>
      import spark.implicits._
      val docs = sizes.toSeq.flatMap { case (s, n) =>
        (0 until n).map(i => ((s + ":" + i).hashCode.toLong << 7 | i, s))
      }.toDF("doc_id", "lang")
      val cells = graft.operators.Sampling.stratifiedExactSplit(
          docs, "lang", "doc_id", seed,
          cuts = Seq(0.8 -> "train", 0.9 -> "val"), last = "test")
        .groupBy("lang", "split").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      sizes.forall { case (s, n) =>
        val t = math.ceil(0.8 * n).toLong
        val v = math.ceil(0.9 * n).toLong - t
        cells.getOrElse((s, "train"), 0L) == t &&
          cells.getOrElse((s, "val"), 0L) == v &&
          cells.getOrElse((s, "test"), 0L) == n - t - v
      }
    }

  property("crossJaccardPairs == self-join pairs restricted, any corpus") =
    Prop.forAll(genDocs) { texts =>
      import spark.implicits._
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val isNew = col("doc_id") % 3 === 0
      val cross = graft.operators.Dedup.crossJaccardPairs(
          docs.filter(isNew), docs.filter(!isNew), n = 2, minJaccard = 0.3,
          maxShingleFreq = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val self = graft.operators.Dedup.ngramJaccardPairs(
          docs, n = 2, minJaccard = 0.3, maxShingleFreq = None)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter { case (a, b, _) => (a % 3 == 0) != (b % 3 == 0) }
        .map { case (a, b, j) =>
          if (a % 3 == 0) (a, b, j) else (b, a, j) }.toSet
      cross == self
    }

  private val genForest: Gen[List[(Long, Long)]] =
    Gen.chooseNum(2, 25).flatMap(n =>
      Gen.sequence[List[(Long, Long)], (Long, Long)](
        (1 until n).map(i => Gen.chooseNum(0, i - 1)
          .map(p => (p.toLong, i.toLong)))))

  property("twoCore: forests peel empty; one added cycle survives whole") =
    Prop.forAll(genForest) { edges =>
      import spark.implicits._
      val n = edges.length + 1
      // enough rounds for the deepest possible chain in this forest
      val forest = graft.operators.Components.twoCore(
        edges.toDF("a", "b"), rounds = n + 1)
      val allPeeled = forest.filter(col("in_core")).count() == 0
      // wire three fresh nodes into a triangle: exactly they survive
      val tri = Seq((100L + n, 101L + n), (101L + n, 102L + n),
        (100L + n, 102L + n))
      val withTri = graft.operators.Components.twoCore(
        (edges ++ tri).toDF("a", "b"), rounds = n + 1)
      val core = withTri.filter(col("in_core"))
        .collect().map(_.getLong(0)).toSet
      allPeeled && core == Set(100L + n, 101L + n, 102L + n)
    }
}
