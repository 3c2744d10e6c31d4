package graft

import graft.operators.{RollingDistinct, Seasonality}

/** Rolling distinct and seasonality strength on hand-built series. */
class RollingSeasonSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L

  test("trailing distinct counts a returner once per window") {
    // u1 active hours 0 and 2 (window 3h) — hours 0,1,2 must each count
    // u1 ONCE; u2 active hour 2 only. Report range clips at hour 2.
    def t(h: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(h * 3600))
    val ev = Seq((1L, t(0)), (1L, t(0)), (1L, t(2)), (2L, t(2)))
      .toDF("user_id", "ts")
    val r = RollingDistinct.trailingDistinct(ev, "user_id", "ts", H, 3)
      .collect().map(x => x.getLong(0) / H -> x.getLong(1)).toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

  test("pure cycle has strength 1, flat series has strength 0") {
    // 48 hourly buckets, value = phase (0..23 repeated): residual 0
    val cyc = (0 until 48).map(i => ("k", i.toLong * H, (i % 24).toLong))
      .toDF("g", "bucket_us", "n")
    val r1 = Seasonality.profileStrength(cyc, Seq("g"), "bucket_us", "n", H, 24)
      .head()
    assert(r1.getAs[Double]("strength") == 1.0)
    assert(r1.getAs[Long]("peak_phase") == 23L)
    // flat-but-nonconstant across phases? flat WITHIN each phase but
    // varying only BETWEEN cycles: phase means all equal -> strength 0
    val flat = (0 until 48).map(i => ("k", i.toLong * H, (i / 24).toLong))
      .toDF("g", "bucket_us", "n")
    val r2 = Seasonality.profileStrength(flat, Seq("g"), "bucket_us", "n", H, 24)
      .head()
    assert(math.abs(r2.getAs[Double]("strength")) < 1e-12)
  }

  test("HLL rolling actives: every bucket lands within 5% of exact") {
    // the query's own filter drops out-of-bound buckets — equal row
    // counts therefore PROVES the 5% bound held everywhere
    val approx = SparkEntry.all("ev_rolling_actives_approx")
      .build(spark, sf("sf0.001"))
    val exact = SparkEntry.all("ev_rolling_actives")
      .build(spark, sf("sf0.001"))
    assert(approx.count() == exact.count())
  }

  test("constant series reports null strength") {
    val c = (0 until 24).map(i => ("k", i.toLong * H, 5L))
      .toDF("g", "bucket_us", "n")
    val r = Seasonality.profileStrength(c, Seq("g"), "bucket_us", "n", H, 24)
      .head()
    assert(r.isNullAt(r.fieldIndex("strength")))
    assert(r.getAs[Double]("mu") == 5.0)
  }
}
