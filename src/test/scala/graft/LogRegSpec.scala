package graft

import org.apache.spark.sql.functions._

import graft.operators.LogReg

/** Full-batch logistic-regression GD: learns a separable boundary (the
  * testdata's labels are noise w.r.t. its features, so the oracle gate can
  * only pin the trajectory — THIS is where learning itself is proven),
  * stays partition-invariant, and the 9-dp rounded trajectory matches a
  * scalar reference step for step.
  */
class LogRegSpec extends SparkSpec {

  import spark.implicits._

  // linearly separable by construction: y = 1 iff f0 + f1 > 1 with margin
  private def separable = (0 until 400).map { i =>
    val f0 = (i % 20) / 10.0        // 0.0 .. 1.9
    val f1 = ((i * 7) % 20) / 10.0  // 0.0 .. 1.9
    val m = f0 + f1 - 2.0
    (f0, f1, if (m > 0.2) 1.0 else if (m < -0.2) 0.0 else -1.0)
  }.filter(_._3 >= 0).toDF("f0", "f1", "y")

  test("learns a separable boundary to >= 95% train accuracy") {
    val df = separable
    val w = LogReg.train(df, Seq(col("f0"), col("f1")), col("y"),
      iters = 60, eta = 4.0)
    val p = LogReg.predict(w, Seq(col("f0"), col("f1")))
    val acc = df.agg(
      avg(when((p >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc >= 0.95, s"train accuracy $acc with weights ${w.toSeq}")
  }

  test("trajectory is partition-invariant (9-dp rounding absorbs sum order)") {
    val df = separable
    val w1 = LogReg.train(df.repartition(1),
      Seq(col("f0"), col("f1")), col("y"), iters = 10, eta = 1.0)
    val w13 = LogReg.train(df.repartition(13),
      Seq(col("f0"), col("f1")), col("y"), iters = 10, eta = 1.0)
    assert(w1.toSeq === w13.toSeq)
  }

  test("weight trajectory matches a scalar reference step for step") {
    val rows = separable.collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def refTrain(iters: Int, eta: Double): Array[Double] = {
      var w = Array(0.0, 0.0, 0.0)
      for (_ <- 1 to iters) {
        var g0 = 0.0; var g1 = 0.0; var g2 = 0.0
        rows.foreach { case (f0, f1, y) =>
          val p = 1.0 / (1.0 + math.exp(-(w(0) + w(1) * f0 + w(2) * f1)))
          g0 += p - y; g1 += (p - y) * f0; g2 += (p - y) * f1
        }
        val n = rows.length.toDouble
        w = Array(w(0) - eta * g0 / n, w(1) - eta * g1 / n,
          w(2) - eta * g2 / n).map(x =>
          BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      w
    }
    val got = LogReg.train(separable, Seq(col("f0"), col("f1")), col("y"),
      iters = 7, eta = 2.0)
    assert(got.toSeq === refTrain(7, 2.0).toSeq)
  }
}
