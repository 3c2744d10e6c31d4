package graft

import org.apache.spark.sql.functions._

import graft.operators.{Changepoint, Cohort}

/** Cohort retention and CUSUM changepoint: hand-computable fixtures pin
  * the semantics the sf-scale oracles then re-verify statistically.
  */
class StatsOps2Spec extends SparkSpec {
  import spark.implicits._

  private val weekUs = 7L * 24 * 3600 * 1000000L

  test("cohort retention: offset 0 is always 1.0 and the triangle counts returners") {
    // week grid: 2024-01-01 is a Monday. u1,u2 start week 0; u1 returns
    // weeks 1 and 2, u2 never returns. u3 starts week 1, returns week 2.
    def ts(week: Int, h: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, h, 0).plusDays(week * 7L))
    val ev = Seq(
      (1L, ts(0, 1)), (2L, ts(0, 2)), (1L, ts(0, 3)), // dup week-0 visit
      (1L, ts(1, 1)), (3L, ts(1, 2)),
      (1L, ts(2, 1)), (3L, ts(2, 2))).toDF("user_id", "ts")
    val r = Cohort.weeklyRetention(ev, "user_id", "ts")
      .collect().map(x => (x.getDate(0).toString, x.getLong(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r(("2024-01-01", 0L)) == ((2L, 1.0)))  // u1+u2
    assert(r(("2024-01-01", 1L)) == ((1L, 0.5)))  // u1 back
    assert(r(("2024-01-01", 2L)) == ((1L, 0.5)))
    assert(r(("2024-01-08", 0L)) == ((1L, 1.0)))  // u3's own cohort
    assert(r(("2024-01-08", 1L)) == ((1L, 1.0)))
    assert(r.size == 5)
  }

  test("cusum finds an obvious level shift at the right bucket") {
    // level 2 for buckets 0..9, level 10 for buckets 10..19: the CUSUM
    // range peaks exactly at the last pre-shift bucket (t=10, bucket 9)
    val series = ((0 until 10).map(i => ("k", i.toLong, 2L)) ++
      (10 until 20).map(i => ("k", i.toLong, 10L)))
      .toDF("g", "bucket_us", "n")
    val row = Changepoint.cusum(series, Seq("g"), "bucket_us", "n").head()
    assert(row.getAs[Long]("n_buckets") == 20L)
    assert(row.getAs[Double]("mu") == 6.0)
    assert(row.getAs[Double]("sigma") == 4.0)
    assert(row.getAs[Long]("cp_bucket_us") == 9L)
    // |S_t| max = 10*|2-6| = 40; stat = 40/(4*sqrt(20))
    assert(math.abs(row.getAs[Double]("cusum_stat")
      - 40.0 / (4.0 * math.sqrt(20.0))) < 1e-12)
  }

  test("cusum: constant series yields null stat and null changepoint") {
    val series = (0 until 5).map(i => ("k", i.toLong, 3L))
      .toDF("g", "bucket_us", "n")
    val row = Changepoint.cusum(series, Seq("g"), "bucket_us", "n").head()
    assert(row.getAs[Double]("sigma") == 0.0)
    assert(row.isNullAt(row.fieldIndex("cusum_stat")))
    assert(row.isNullAt(row.fieldIndex("cp_bucket_us")))
  }

  test("cusum tie-break picks the earliest bucket") {
    // alternating 0,2: μ = 1 EXACTLY in binary, so |S_t| = 1,0,1,0 is an
    // exact tie between buckets 0 and 2; the earliest must win
    val series = Seq(("k", 0L, 0L), ("k", 1L, 2L), ("k", 2L, 0L),
      ("k", 3L, 2L)).toDF("g", "bucket_us", "n")
    val row = Changepoint.cusum(series, Seq("g"), "bucket_us", "n").head()
    assert(row.getAs[Long]("cp_bucket_us") == 0L)
  }
}
