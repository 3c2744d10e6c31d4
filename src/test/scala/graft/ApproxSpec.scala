package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct (HLL++) must stay within its configured relative
  * error of the exact distinct counts — the scale path for A-class distinct
  * aggregation (SURVEY.md §7.3c).
  */
class ApproxSpec extends SparkSpec {

  test("percentile_approx tracks exact interpolated percentile on large groups") {
    // NB: percentile_approx is nearest-rank (no interpolation), so tiny
    // groups legitimately diverge from the interpolated exact value — the
    // approx gold mart is a large-group scale path. Verify convergence on
    // ~3k-row groups.
    val both = Tables.orders(spark, sf("sf0.01"))
      .groupBy("o_orderpriority")
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("exact_med"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("approx_med"))
    both.collect().foreach { r =>
      val e = r.getAs[Double]("exact_med")
      val a = r.getAs[Double]("approx_med")
      assert(math.abs(a - e) / e <= 0.02, s"approx $a vs exact $e")
    }
  }

  test("approx distinct within 2x configured rsd of exact") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val both = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
    both.collect().foreach { r =>
      val e = r.getAs[Long]("exact").toDouble
      val a = r.getAs[Long]("approx").toDouble
      assert(math.abs(a - e) / e <= 0.04, s"approx $a vs exact $e")
    }
  }
}
