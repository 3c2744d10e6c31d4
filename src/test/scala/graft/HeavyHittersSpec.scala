package graft

import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, TextFunctions}

/** Misra-Gries guarantee against exact counts on the real corpus: for every
  * sketched item `true - N/(k+1) <= est <= true`, and every item with true
  * frequency above N/(k+1) appears in the sketch — including after the
  * distributed (partition-merged) aggregation path.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def corpusTokens = Tables.documents(spark, sf())
    .select(explode(TextFunctions.tokens(col("text"))).as("token"))

  test("sketch bounds + heavy-hitter completeness vs exact counts") {
    val k = 64
    val toks = corpusTokens.repartition(8) // force real partition merges
    val sketch = toks.as[String].select(new MisraGries(k).toColumn).head()
    val exact = corpusTokens.groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val slack = n / (k + 1)

    assert(sketch.nonEmpty && sketch.size <= k)
    sketch.foreach { case (token, est) =>
      val t = exact.getOrElse(token, 0L)
      assert(est <= t, s"$token overestimated: $est > $t")
      assert(est >= t - slack, s"$token under floor: $est < $t - $slack")
    }
    // completeness: anything truly frequent must be in the sketch
    exact.filter(_._2 > slack).keys.foreach { token =>
      assert(sketch.contains(token), s"heavy hitter $token missing")
    }
  }

  test("merge rule keeps the guarantee when summaries combine") {
    val mg = new MisraGries(2)
    val a = Seq("x", "x", "x", "y").foldLeft(mg.zero)(mg.reduce)
    val b = Seq("x", "z", "z").foldLeft(mg.zero)(mg.reduce)
    val m = mg.merge(a, b)
    assert(m.size <= 2)
    assert(m.contains("x")) // overall majority item always survives
    assert(m("x") <= 4)     // never overestimates
  }
}
