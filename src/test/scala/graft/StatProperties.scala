package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Acf, Changepoint, Cohort, Drift, Hampel, QuantileNorm}

/** Mathematical invariants of the round-5 statistics operators over
  * random series/frames — the properties that must hold for ANY input,
  * complementing the fixed-fixture specs and the sf-scale oracles.
  */
object StatProperties extends Properties("StatOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = GraftSession.builder("stat-props", cores = 4).getOrCreate()
  import spark.implicits._

  private val genSeries: Gen[List[Long]] =
    Gen.chooseNum(8, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 50L)))

  private def seriesDf(xs: List[Long]) =
    xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("g", "bucket_us", "n")

  property("ACF is bounded by ±1 at every lag") =
    Prop.forAll(genSeries) { xs =>
      val rows = Acf.autocorr(seriesDf(xs), Seq("g"), "bucket_us", "n", 3)
        .collect()
      rows.forall(r => r.isNullAt(3) || math.abs(r.getDouble(3)) <= 1.0 + 1e-12)
    }

  property("CUSUM statistic and changepoint are shift-invariant") =
    Prop.forAll(genSeries, Gen.choose(1L, 1000L)) { (xs, c) =>
      def run(s: List[Long]) = {
        val r = Changepoint.cusum(seriesDf(s), Seq("g"), "bucket_us", "n")
          .head()
        (Option(r.getAs[java.lang.Double]("cusum_stat")).map(_.toDouble),
          Option(r.getAs[java.lang.Long]("cp_bucket_us")).map(_.toLong))
      }
      val (s1, cp1) = run(xs)
      val (s2, cp2) = run(xs.map(_ + c))
      // devs are identical under a constant shift → identical argmax; the
      // statistic matches to float noise (μ shifts but every dev cancels)
      cp1 == cp2 && ((s1, s2) match {
        case (Some(a), Some(b)) => math.abs(a - b) < 1e-9
        case (None, None) => true
        case _ => false
      })
    }

  property("PSI of a group against itself-shaped data is 0; always >= 0") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0, 99))) { vs =>
      // two groups with IDENTICAL value multisets → p == p_ref bin-wise
      // → every (p−q)ln(p/q) term is exactly 0; any other pair ≥ 0
      // (each term has matching signs in both factors)
      val df = (vs.map(v => ("a", v)) ++ vs.map(v => ("b", v)) ++
        vs.reverse.map(v => ("c", (v * 7 + 13) % 100)))
        .toDF("g", "v")
      val rows = Drift.psiByGroup(df, "g", "v", buckets = 10, refGroup = "a")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      rows("b") == 0.0 && rows.values.forall(_ >= -1e-12)
    }

  property("cohort retention is 1.0 at offset 0 and never exceeds 1") =
    Prop.forAll(Gen.listOfN(30, for {
      u <- Gen.choose(1L, 8L)
      d <- Gen.choose(0L, 80L)
    } yield (u, d))) { rows =>
      val df = rows.map { case (u, d) =>
        (u, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(d * 86400)))
      }.toDF("user_id", "ts")
      val r = Cohort.weeklyRetention(df, "user_id", "ts").collect()
      r.forall(x => x.getDouble(3) <= 1.0 + 1e-12) &&
        r.filter(_.getLong(1) == 0L).forall(_.getDouble(3) == 1.0)
    }

  property("Hampel flags nothing on a constant series") =
    Prop.forAll(Gen.choose(0L, 50L), Gen.chooseNum(8, 30)) { (v, n) =>
      val df = (0 until n).map(i => ("k", i.toLong, v))
        .toDF("g", "bucket_us", "n")
      Hampel.filter(df, Seq("g"), "bucket_us", "n", 1L, k = 3)
        .head().getAs[Long]("n_flagged") == 0L
    }

  property("percentile rank lands in [0,1] with extremes at the bounds") =
    Prop.forAll(Gen.listOfN(25, Gen.choose(0, 9))) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("id", "g", "v")
      val out = QuantileNorm.percentileRank(df, "g", "v")
        .select("v", "pr").collect()
        .map(r => r.getInt(0) -> r.getDouble(1))
      val inRange = out.forall { case (_, p) => p >= 0.0 && p <= 1.0 }
      val minsAtZero = out.filter(_._1 == vs.min).forall(_._2 == 0.0)
      // the max value's pr is 1 only when it is untied for the max AND
      // the group has >1 distinct value; with ties it is (rank-1)/(n-1)
      inRange && minsAtZero
    }
}
