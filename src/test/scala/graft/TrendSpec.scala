package graft

import org.apache.spark.sql.functions._

import graft.operators.Trend

/** OLS from integer sufficient statistics: exact line recovery, guarded
  * degenerate groups, and bit-identical results under repartitioning (the
  * property float `regr_slope` cannot give).
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exact line per group") {
    // g1: y = 3x + 7 exactly; g2: y = -2x + 100 exactly
    val pts = (0L to 10L).flatMap(x =>
      Seq(("g1", x, 3 * x + 7), ("g2", x, -2 * x + 100)))
    val r = Trend.olsTrend(pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(row => row.getString(0) ->
        ((row.getDouble(2), row.getDouble(3)))).toMap
    assert(r("g1") == ((3.0, 7.0)))   // exact: integer stats, clean division
    assert(r("g2") == ((-2.0, 100.0)))
  }

  test("noisy points land the textbook least-squares fit") {
    // symmetric residuals around y = 2x + 1 cancel in the normal equations
    val pts = Seq((0L, 0L), (1L, 4L), (2L, 5L), (3L, 7L), (4L, 9L))
      .map { case (x, y) => ("g", x, y) }
    val row = Trend.olsTrend(pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .head()
    assert(math.abs(row.getDouble(2) - 2.1) < 1e-12) // hand-computed slope
    assert(math.abs(row.getDouble(3) - 0.8) < 1e-12)
  }

  test("single point and zero x-variance yield null, never NaN") {
    val pts = Seq(("one", 5L, 9L),
      ("flat", 2L, 1L), ("flat", 2L, 3L), ("flat", 2L, 5L))
    val rows = Trend.olsTrend(pts.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("one").isNullAt(2) && rows("one").isNullAt(3))
    assert(rows("flat").isNullAt(2) && rows("flat").isNullAt(3))
  }

  test("bit-identical across partitionings") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(500)(("g", rnd.nextInt(100).toLong,
      rnd.nextInt(1000000).toLong))
    val a = Trend.olsTrend(pts.toDF("g", "x", "y").repartition(1),
      Seq("g"), "x", "y").head()
    val b = Trend.olsTrend(pts.toDF("g", "x", "y").repartition(13, col("y")),
      Seq("g"), "x", "y").head()
    assert(a.getDouble(2) == b.getDouble(2)) // == on doubles: EXACT equality
    assert(a.getDouble(3) == b.getDouble(3))
  }
}
