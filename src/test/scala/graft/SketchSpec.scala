package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMin, Hll}

/** The md5-deterministic mergeable sketches: Count-Min (point frequency)
  * and HLL (distinct). Pins the properties the oracles can't state —
  * merge/partitioning invariance, the one-sided CM error bound, HLL
  * accuracy vs exact — plus JVM↔Column hash agreement, which is what makes
  * the DuckDB replays bit-exact.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("CountMin: JVM cell == Column cell for every row") {
    val keys = (1 to 200).map(_.toString)
    val d = 4; val w = 64
    val fromCol = keys.toDF("k")
      .select(col("k"), array((0 until d).map(i =>
        CountMin.cellCol(col("k"), i, w)): _*).as("cells"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    keys.foreach { k =>
      val base = CountMin.base32(k)
      (0 until d).foreach { i =>
        assert(CountMin.cell(base, i, w).toLong === fromCol(k)(i),
          s"cell mismatch key=$k row=$i")
      }
    }
  }

  test("CountMin: estimate is never under, over by at most (e/w)·N here") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .filter(col("user_id").isNotNull)
    val d = 4; val w = 256
    val cm = udaf(new CountMin(d, w))
    val sketch = ev.agg(cm(col("user_id").cast("string"))).head.getSeq[Long](0)
    val n = sketch.slice(0, w).sum // row 0 holds every increment once
    val rows = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
      .select(col("user_id"), col("exact"),
        CountMin.estimateCol(sketch, d, w,
          col("user_id").cast("string")).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact"); val est = r.getAs[Long]("est")
      assert(est >= exact, s"undercount for ${r.get(0)}: $est < $exact")
      assert(est - exact <= (math.E / w * n).ceil.toLong,
        s"over bound for ${r.get(0)}: $est vs $exact (N=$n)")
    }
  }

  test("CountMin: merge of split sketches == one-pass sketch") {
    val agg = new CountMin(2, 32)
    val keys = (1 to 500).map(i => (i % 37).toString)
    val one = keys.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = keys.splitAt(123)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(one.toSeq === merged.toSeq)
  }

  test("HLL: repartitioning never changes the estimate") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .filter(col("user_id").isNotNull)
    val hll = udaf(new Hll)
    def est(parts: Int): Seq[(String, Double)] =
      ev.repartition(parts).groupBy("event_type")
        .agg(hll(col("user_id").cast("string")).as("e"))
        .as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(est(1) === est(13))
  }

  test("HLL: estimate within 20% of exact per event_type (m=64 regime)") {
    val ev = Tables.events(spark, sf("sf0.01"))
      .filter(col("user_id").isNotNull)
    val hll = udaf(new Hll)
    val rows = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        hll(col("user_id").cast("string")).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Double]("est")
      assert(math.abs(a - e) / e <= 0.20, s"${r.get(0)}: est $a vs exact $e")
    }
  }

  test("HLL: rho matches a bit-by-bit reference on edge suffixes") {
    val cases = Seq(0L -> 55, 1L -> 54, 2L -> 53, 3L -> 53,
      (1L << 53) -> 1, ((1L << 54) - 1) -> 1)
    cases.foreach { case (w, want) =>
      assert(Hll.rho(w) === want, s"rho($w)")
      var r = 0; var x = w
      while (x > 0) { r += 1; x >>= 1 } // bit-by-bit bitlength
      assert(Hll.rho(w) === Hll.MaxRho - r)
    }
    // empty input → every register 0 → linear-counting with V = m → 0.0
    assert(Hll.estimate(new Array[Int](Hll.M)) === 0.0)
  }
}
