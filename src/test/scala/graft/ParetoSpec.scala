package graft

import org.apache.spark.sql.functions._

import graft.operators.Pareto

/** The bucketed skyline must equal the brute-force domination definition
  * on arbitrary inputs, and be invariant to the bucket count (the sharding
  * is a physical choice, never a semantic one).
  */
class ParetoSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Double, Double)]): Set[(Double, Double)] = {
    val d = pts.distinct
    d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.toSet
  }

  private def viaOp(pts: Seq[(Double, Double)], buckets: Int) =
    Pareto.frontier2d(pts.toDF("x", "y"), "x", "y", nBuckets = buckets)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet

  test("matches brute-force domination on random point sets") {
    val rnd = new scala.util.Random(42) // seeded: failures must reproduce
    for (trial <- 1 to 20) {
      // small value grid forces heavy x/y ties — the hard case
      val pts = Seq.fill(60)((rnd.nextInt(10).toDouble, rnd.nextInt(10).toDouble))
      assert(viaOp(pts, 4) == brute(pts), s"trial=$trial pts=$pts")
    }
  }

  test("bucket count never changes the answer") {
    val pts = Seq((1.0, 5.0), (1.0, 5.0), (2.0, 5.0), (2.0, 7.0),
      (3.0, 7.0), (0.5, 1.0), (4.0, 8.0), (4.0, 8.0), (5.0, 2.0))
    val expected = brute(pts)
    for (b <- Seq(1, 2, 7, 64)) {
      assert(viaOp(pts, b) == expected, s"nBuckets=$b")
    }
  }

  test("ties: duplicates collapse, equal-y keeps only the cheapest x") {
    // (2,5) duplicated; (3,5) has the same y as (2,5) but costs more
    val pts = Seq((2.0, 5.0), (2.0, 5.0), (3.0, 5.0), (1.0, 1.0))
    assert(viaOp(pts, 3) == Set((2.0, 5.0), (1.0, 1.0)))
  }

  test("nulls are dropped, not propagated") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (null, 9.0), (0.5, null)).toDF("x", "y")
    val got = Pareto.frontier2d(df, "x", "y", nBuckets = 2).collect()
    assert(got.map(r => (r.getDouble(0), r.getDouble(1))).toSet ==
      Set((1.0, 2.0)))
  }
}
