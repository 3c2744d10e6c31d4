package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ewma, Histogram, MutualInfo}

/** Histogram / mutual-information / trailing-EWMA: hand-computed values,
  * degenerate inputs, and the determinism contracts the oracles lean on.
  */
class StatsOpsSpec extends SparkSpec {
  import spark.implicits._

  test("equiWidth bins a known distribution, max lands in the last bucket") {
    // values 0..9 into 5 buckets of width 2: pairs per bucket
    val df = (0 until 10).map(_.toDouble).toDF("v")
    val h = Histogram.equiWidth(df, "v", 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(h.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(h.values.map(_._1).toSeq.forall(_ == 2L))
    assert(h(0L)._2 == 0.0 && h(0L)._3 == 1.8)       // width = 9/5 = 1.8
    assert(h(4L)._2 == 7.2 && h(4L)._3 == 9.0)
    // the max (9.0) is capped into bucket 4, not a phantom bucket 5
  }

  test("equiWidth: constant column collapses into bucket 0; nulls dropped") {
    val df = Seq(Some(5.0), Some(5.0), None).toDF("v")
    val h = Histogram.equiWidth(df, "v", 10).collect()
    assert(h.length == 1)
    assert(h.head.getLong(0) == 0L && h.head.getLong(1) == 2L)
  }

  test("mutual information: independent columns give MI 0, identical give H") {
    // x uniform over {a,b}, y uniform over {c,d}, all 4 combos equally
    val indep = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("x", "y")
    val r1 = MutualInfo.categorical(indep, "x", "y").head()
    assert(math.abs(r1.getAs[Double]("mi_nats")) < 1e-12)
    assert(math.abs(r1.getAs[Double]("h_x") - math.log(2)) < 1e-12)

    // y == x: MI equals the entropy, NMI is exactly 1
    val same = Seq(("a", "a"), ("b", "b"), ("a", "a"), ("b", "b"))
      .toDF("x", "y")
    val r2 = MutualInfo.categorical(same, "x", "y").head()
    assert(math.abs(r2.getAs[Double]("mi_nats") - math.log(2)) < 1e-12)
    assert(math.abs(r2.getAs[Double]("nmi") - 1.0) < 1e-12)
  }

  test("trailing EWMA: hand-computed weights, short-history renormalization") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 4.0))
      .toDF("k", "id", "v")
      .withColumn("ts", timestamp_micros(col("id") * 1000000L))
    val r = Ewma.trailing(df, "k", "ts", "id", "v", alpha = 0.5, k = 3)
      .orderBy("id").select("ewma").as[Double].collect()
    // row 1: only itself -> 1.0 (weights renormalize to the present lags)
    assert(math.abs(r(0) - 1.0) < 1e-12)
    // row 2: (.5*2 + .25*1)/(.75) = 5/3
    assert(math.abs(r(1) - 5.0 / 3.0) < 1e-12)
    // row 3: (.5*4 + .25*2 + .125*1)/(.875) = 2.625/0.875 = 3.0
    assert(math.abs(r(2) - 3.0) < 1e-12)
  }

  test("interarrival: metronome CV 0, hand-computed bursty CV, singleton drop") {
    import graft.operators.Interarrival
    val rows = Seq(
      // "bot": exact 10s metronome
      (1L, 1L, 0L), (1L, 2L, 10000000L), (1L, 3L, 20000000L),
      // "bursty": gaps 1s and 3s -> mean 2s, var 1s², cv 0.5
      (2L, 4L, 0L), (2L, 5L, 1000000L), (2L, 6L, 4000000L),
      // singleton: no gaps, absent from output
      (3L, 7L, 0L))
    val df = rows.toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Interarrival.stats(df, "user_id", "ts", "event_id")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == ((2L, 10.0, 0.0)))           // exact: integer stats
    assert(r(2L)._1 == 2L && r(2L)._2 == 2.0)
    assert(math.abs(r(2L)._3 - 0.5) < 1e-12)
  }

  test("gini: perfect equality 0, single-holder (n-1)/n, exact on integers") {
    import graft.operators.Concentration
    val eq = (1 to 5).map(i => ("g", i.toLong, 10.0))
    val one = (1 to 5).map(i => ("h", i.toLong, if (i == 5) 50.0 else 0.0))
    val r = Concentration.gini((eq ++ one).toDF("g", "id", "v"), "g", "id", "v")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r("g") == 0.0)            // exact: integer stats, clean division
    assert(math.abs(r("h") - 0.8) < 1e-12) // (n-1)/n with n=5
  }

  test("KS drift: identical distributions 0, disjoint supports 1") {
    import graft.operators.Drift
    val same = Seq("a", "b").flatMap(g => (1 to 20).map(i => (g, i.toDouble)))
    val far = (1 to 20).map(i => ("c", i + 1000.0))
    val r = Drift.ksByGroup((same ++ far).toDF("g", "v"), "g", "v", 10)
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2))
      .toMap
    assert(r(("a", "b")) == 0.0)     // bin-identical => CDFs identical
    assert(r(("a", "c")) == 1.0 && r(("b", "c")) == 1.0)
  }

  test("selectK: matches brute-force order statistics at every q") {
    import graft.operators.SelectK
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 3.0, 7.0, 2.0, 8.0, 6.0, 4.0)
    val sorted = vals.sorted
    val df = vals.toDF("v").repartition(4)
    for (q <- Seq(0.0, 0.1, 0.5, 0.77, 1.0)) {
      val k = math.floor((vals.size - 1) * q).toInt // 0-based brute index
      val row = SelectK.quantileDisc(df, "v", q, buckets = 4).head()
      assert(row.getLong(0) == vals.size.toLong)
      assert(row.getDouble(1) == sorted(k), s"q=$q")
    }
    // pathological: constant column collapses into one bucket, still exact
    val const = Seq.fill(10)(42.0).toDF("v")
    assert(SelectK.quantileDisc(const, "v", 0.5).head().getDouble(1) == 42.0)
  }

  test("EWMA weights are the geometric ladder the oracle embeds") {
    val ws = Ewma.weights(0.4, 6)
    assert(ws.length == 6)
    assert(math.abs(ws.head - 0.4) < 1e-15)
    ws.sliding(2).foreach { case Seq(a, b) =>
      assert(math.abs(b / a - 0.6) < 1e-12)
    }
    // truncation mass below the published 6-decimal rounding needs k>=...
    // not asserted: the renormalizing denominator absorbs it exactly.
  }
}
