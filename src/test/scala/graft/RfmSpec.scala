package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Rfm}

/** RFM threshold scoring and containment dedup: hand-checked quintiles,
  * value-determinism under repartitioning, subset-catching containment.
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("distinct metrics spread customers across all five scores") {
    // 10 customers; customer k ordered k times, total 100k, last day k
    val rows = (1 to 10).flatMap(k =>
      (1 to k).map(i => (k.toLong, ts(k), 100.0 * k)))
    val df = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = Rfm.scores(df, "o_custkey", "o_orderdate", "o_totalprice")
      .collect().map(row => row.getLong(0) ->
        ((row.getInt(3), row.getInt(4), row.getInt(5), row.getString(6))))
      .toMap
    // metrics are all strictly increasing in k, so the three scores agree
    assert(r(1) == ((1, 1, 1, "111")))
    assert(r(10) == ((5, 5, 5, "555")))
    assert((1 to 10).map(k => r(k)._1).toSet == Set(1, 2, 3, 4, 5))
    // interpolated quintile edges put exactly 2 of 10 customers per score
    assert((1 to 10).groupBy(k => r(k)._1).values.forall(_.size == 2))
  }

  test("scores are value-determined: repartitioning changes nothing") {
    val rows = (1 to 40).map(k =>
      ((k % 7).toLong + 1, ts(k % 25 + 1), 10.0 * (k % 11 + 1)))
    val df = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val once = Rfm.scores(df, "o_custkey", "o_orderdate", "o_totalprice")
      .orderBy("o_custkey").collect().toSeq
    val again = Rfm.scores(df.repartition(13), "o_custkey", "o_orderdate",
      "o_totalprice").orderBy("o_custkey").collect().toSeq
    assert(once == again)
  }

  test("containment catches a subset duplicate that Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, n = 3, minContainment = 0.9,
      maxShingleFreq = None).collect()
    assert(cont.length == 1)
    assert(cont.head.getDouble(2) == 1.0) // every shingle of small is in big
    val jac = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
      maxShingleFreq = None).collect()
    assert(jac.isEmpty) // same pair, but Jaccard ~ 4/44 — invisible
  }
}
