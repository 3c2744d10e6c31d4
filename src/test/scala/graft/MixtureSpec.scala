package graft

import graft.operators.Mixture

/** Water-filling invariants: hand-computed level, budget conservation,
  * caps respected, all-capped degenerate case.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: prefix caps, remainder splits by weight") {
    // ratios a/w: A=10, C=50, B=100 -> order A, C, B
    // A caps (10 <= 110*1/4); C does not (100 > 100*2/3) -> level 100/3
    val per = Seq(("A", 10L, 1.0), ("B", 100L, 1.0), ("C", 100L, 2.0))
      .toDF("source", "avail", "w")
    val got = Mixture.waterfill(per, "source", "avail", "w", budget = 110L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getInt(4)))
    assert(got(0) == (("A", 10.0, 1)))
    assert(got(1) == (("B", 33.333333, 0)))
    assert(got(2) == (("C", 66.666667, 0)))
  }

  test("allocations spend the budget and never exceed availability") {
    val per = Seq.tabulate(9) { i =>
      (s"s$i", (i + 1L) * 50L, math.pow((i + 1) * 50.0, 0.7))
    }.toDF("source", "avail", "w")
    val rows = Mixture.waterfill(per, "source", "avail", "w", budget = 1000L)
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    rows.foreach { case (a, t) => assert(t <= a + 1e-6) }
    val spent = rows.map(_._2).sum
    assert(math.abs(spent - 1000.0) < 1e-3, s"spent $spent of 1000")
  }

  test("budget above total availability caps every source") {
    val per = Seq(("A", 10L, 1.0), ("B", 20L, 5.0)).toDF("source", "avail", "w")
    val got = Mixture.waterfill(per, "source", "avail", "w", budget = 1000L)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getInt(4))).toSet
    assert(got == Set(("A", 10.0, 1), ("B", 20.0, 1)))
  }
}
