package graft

import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Distributed prefix sum: equality with the single-window cumsum on
  * every bucket layout, bucket-boundary exactness, empty input.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("matches the single-window cumsum for any bucket count") {
    val rows = Seq(10L -> 3L, 25L -> -1L, 40L -> 5L, 41L -> -2L,
      999L -> 7L, 1000L -> -7L, 5000L -> 1L)
    val df = rows.toDF("t", "d")
    val expected = rows.sortBy(_._1)
      .scanLeft(0L)(_ + _._2).tail // running sums in t order
    for (buckets <- Seq(1, 2, 7, 1024)) {
      val got = PrefixSum.overOrdered(df.repartition(5), "t", "d", buckets)
        .orderBy("t").select("cum").as[Long].collect().toSeq
      assert(got == expected, s"buckets=$buckets")
    }
  }

  test("span smaller than bucket count and single-row input") {
    val df = Seq(7L -> 2L).toDF("t", "d")
    val got = PrefixSum.overOrdered(df, "t", "d", 1024).collect()
    assert(got.length == 1 && got.head.getAs[Long]("cum") == 2L)
  }

  test("empty input yields an empty frame, not a failure") {
    val df = Seq.empty[(Long, Long)].toDF("t", "d")
    assert(PrefixSum.overOrdered(df, "t", "d", 16).count() == 0L)
  }

  test("negative keys and epoch-magnitude spans stay exact") {
    // span ~3e18 would overflow any (t-lo)*buckets formulation
    val rows = Seq(-1500000000000000000L -> 1L, 0L -> 1L,
      1500000000000000000L -> 1L)
    val df = rows.toDF("t", "d")
    val got = PrefixSum.overOrdered(df, "t", "d", 512)
      .orderBy("t").select("cum").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
