package graft

import graft.operators.Profile

/** Profiler contracts: null/distinct accounting, native-order min/max
  * (NOT lexicographic on numbers), stable rendering, one row per column.
  */
class ProfileSpec extends SparkSpec {

  test("nulls, distincts, and native-ordered min/max per column") {
    import spark.implicits._
    val df = Seq(
      (Some(9L), Some("b"), Some(2.5)),
      (Some(10L), None, Some(1.25)),
      (None, Some("a"), Some(2.5))
    ).toDF("k", "s", "x")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet == Set("k", "s", "x"))
    val k = p("k")
    assert(k.getLong(1) == 3 && k.getLong(2) == 1 && k.getLong(3) == 2)
    // native long ordering: 9 < 10 (lexicographic would say "10" < "9")
    assert(k.getString(4) == "9" && k.getString(5) == "10")
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
    val x = p("x")
    // doubles render through DECIMAL(24,6): fixed scale, engine-stable
    assert(x.getString(4) == "1.250000" && x.getString(5) == "2.500000")
    assert(x.getLong(3) == 2) // distinct ignores duplicates
  }

  test("column subset profiles only what was asked") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "s")
    val out = Profile.profile(df, Seq("s")).collect()
    assert(out.length == 1 && out.head.getString(0) == "s")
  }

  test("approx mode: distinct within 5% of exact, other columns identical, no Expand") {
    val orders = Tables.orders(spark, sf("sf0.01"))
    val exact = Profile.profile(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.profile(orders, exactDistinct = false)
    val plan = approx.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Expand"), "approx profile must not multiply input")
    approx.collect().foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2))
      assert(r.getString(4) == e.getString(4) && r.getString(5) == e.getString(5))
      val (a, x) = (r.getLong(3).toDouble, e.getLong(3).toDouble)
      assert(math.abs(a - x) / math.max(x, 1.0) < 0.05,
        s"${r.getString(0)}: approx $a vs exact $x")
    }
  }
}
