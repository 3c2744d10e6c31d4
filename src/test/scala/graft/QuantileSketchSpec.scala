package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

/** Quantile-sketch contract: exact below the compaction threshold, rank
  * error bounded on uniform and heavy-tailed data (through Spark's real
  * partial/merge aggregation path), weight conserved through compaction,
  * and empty input → NaN.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.5, 0.9, 0.99)

  /** True rank of the estimate in the data, as a fraction of n. */
  private def rankErr(data: Seq[Double], est: Double, p: Double): Double = {
    val below = data.count(_ <= est).toDouble / data.size
    math.abs(below - p)
  }

  test("exact (nearest-rank) while n <= k: no compaction has happened") {
    val data = (1 to 100).map(_.toDouble)
    val est = data.toDF("v").repartition(4)
      .agg(udaf(new QuantileSketch(128, probs)).apply(col("v")))
      .head().getSeq[Double](0)
    assert(est == Seq(50.0, 90.0, 99.0))
  }

  test("rank error <= 2% at k=256 on 20k uniform values (partitioned agg)") {
    val data = (1 to 20000).map(i => (i * 7919 % 20011).toDouble)
    val est = data.toDF("v").repartition(32)
      .agg(udaf(new QuantileSketch(256, probs)).apply(col("v")))
      .head().getSeq[Double](0)
    probs.zip(est).foreach { case (p, e) =>
      assert(rankErr(data, e, p) <= 0.02, s"p=$p est=$e err=${rankErr(data, e, p)}")
    }
  }

  test("rank error <= 2% on a heavy-tailed distribution") {
    val data = (1 to 20000).map(i => math.exp((i * 7919 % 20011) / 2000.0))
    val est = data.toDF("v").repartition(32)
      .agg(udaf(new QuantileSketch(256, probs)).apply(col("v")))
      .head().getSeq[Double](0)
    probs.zip(est).foreach { case (p, e) =>
      assert(rankErr(data, e, p) <= 0.02, s"p=$p est=$e err=${rankErr(data, e, p)}")
    }
  }

  test("compaction conserves total weight exactly") {
    val sk = new QuantileSketch(8, Seq(0.5))
    val st = (1 to 1000).map(_.toDouble)
      .foldLeft(sk.zero)((b, x) => sk.reduce(b, x))
    val weight = st.lv.zipWithIndex
      .map { case (buf, i) => buf.size.toLong << i }.sum
    assert(weight == 1000L)
    // and the buffer stays O(k log n), nowhere near n
    assert(st.lv.map(_.size).sum <= 8 * st.lv.size + 8)
  }

  test("empty input estimates NaN") {
    val est = Seq.empty[Double].toDF("v")
      .agg(udaf(new QuantileSketch(64, Seq(0.5))).apply(col("v")))
      .head().getSeq[Double](0)
    assert(est.forall(_.isNaN))
  }
}
