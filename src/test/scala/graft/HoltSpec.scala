package graft

import org.apache.spark.sql.functions._

import graft.functions.HoltSmooth

/** Holt double-exponential smoothing: hand-computed recurrence, split/merge
  * invariance (concat buffer ⇒ any partitioning folds the same sorted
  * series), and trend recovery on a pure linear ramp.
  */
class HoltSpec extends SparkSpec {

  import spark.implicits._

  private def ref(xs: Seq[Double], a: Double, be: Double): (Double, Double) = {
    var l = xs.head; var b = 0.0
    xs.drop(1).foreach { x =>
      val lp = l
      l = a * x + (1.0 - a) * (l + b)
      b = be * (l - lp) + (1.0 - be) * b
    }
    (l, b)
  }

  test("matches the hand recurrence exactly") {
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0)
    val agg = new HoltSmooth(0.3, 0.1)
    val buf = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x.toLong) }.toVector
    val got = agg.finish(buf)
    val (l, b) = ref(xs, 0.3, 0.1)
    assert(got.n_buckets == 6L)
    assert(got.level == l && got.trend == b)
  }

  test("merge order and partitioning never change the fit") {
    val ev = Tables.events(spark, sf("sf0.001"))
    val dense = graft.operators.Resample.gapFilledCounts(
      ev, "ts", Seq("event_type"), 3600000000L)
    val holt = udaf(new HoltSmooth(0.3, 0.1))
    def fit(parts: Int) = dense.repartition(parts)
      .groupBy("event_type")
      .agg(holt(col("bucket_us"), col("n")).as("f"))
      .select(col("event_type"), col("f.level"), col("f.trend"))
      .as[(String, Double, Double)].collect().sortBy(_._1).toSeq
    assert(fit(1) === fit(17))
  }

  test("recovers the slope of a pure linear ramp") {
    val xs = (0 until 200).map(i => 5.0 + 2.0 * i)
    val agg = new HoltSmooth(0.3, 0.1)
    val got = agg.finish(xs.zipWithIndex
      .map { case (x, i) => (i.toLong, x.toLong) }.toVector)
    assert(math.abs(got.trend - 2.0) < 0.05, s"trend ${got.trend}")
    assert(math.abs(got.level - xs.last) < 1.0, s"level ${got.level}")
  }

  test("backtest residuals: zero on a constant series, positive on noise") {
    val agg = new HoltSmooth(0.3, 0.1)
    // constant series forecasts itself exactly from step 1: l=c, b=0
    val const = agg.finish(Vector.tabulate(50)(i => (i.toLong, 7L)))
    assert(const.sae == 0.0 && const.se2 == 0.0)
    // alternating series cannot be tracked exactly -> strictly positive
    val noisy = agg.finish(Vector.tabulate(50)(i =>
      (i.toLong, if (i % 2 == 0) 10L else 2L)))
    assert(noisy.sae > 0.0 && noisy.se2 > 0.0)
    // hand-check the first residual: x2 - (l1 + b1) = 2 - 10
    assert(noisy.sae >= 8.0)
  }
}
