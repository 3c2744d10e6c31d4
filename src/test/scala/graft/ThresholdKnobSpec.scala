package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Histogram, LmScore, Rfm}

/** The exact-vs-approx threshold knob on the three percentile-threshold
  * operators (LmScore.tercileBuckets, Rfm.scores, Histogram.equiDepth).
  * Exact `percentile` buffers every group value in one aggregation buffer
  * — correct and oracle-gated, but an OOM at a 100 TB dominant group —
  * so each op takes an `accuracy` knob that swaps in `percentile_approx`
  * (bounded mergeable sketch) with the identical downstream expression.
  * These tests pin that at high accuracy on realistic-shaped data the two
  * modes assign (nearly) identical buckets: the only divergence allowed
  * is boundary rows where exact interpolation lands between data values.
  */
class ThresholdKnobSpec extends SparkSpec {
  import spark.implicits._

  private val Acc = 10000

  test("tercileBuckets: approx mode agrees with exact on >= 95% of docs " +
    "and keeps per-group thirds") {
    // 3 languages x 120 docs, deterministic pseudo-random-ish scores
    val rows = for {
      g <- Seq("en", "de", "fr"); i <- 1 to 120
    } yield (s"$g-$i", g, math.round(math.sin(i * 7 + g.length) * 1e6) / 1e6)
    val scored = rows.toDF("doc_id", "lang", "score")

    val exact = LmScore.tercileBuckets(scored)
      .select("doc_id", "bucket").as[(String, String)].collect().toMap
    val approx = LmScore.tercileBuckets(scored, accuracy = Acc)
      .select("doc_id", "bucket").as[(String, String)].collect().toMap

    assert(exact.keySet == approx.keySet)
    val agree = exact.count { case (k, b) => approx(k) == b }
    assert(agree >= (exact.size * 0.95).toInt,
      s"only $agree/${exact.size} docs agree")
    // approx mode still yields ~thirds per group (within 5 docs of 40)
    val counts = LmScore.tercileBuckets(scored, accuracy = Acc)
      .groupBy("lang", "bucket").count().as[(String, String, Long)]
      .collect()
    assert(counts.forall { case (_, _, c) => math.abs(c - 40L) <= 5 })
  }

  test("Rfm: approx mode agrees with exact on >= 90% of score digits") {
    // 50 customers with strictly distinct recency/frequency/monetary —
    // with ties an exact interpolated edge can split a tied cohort that
    // an approx (data-valued) edge keeps whole, which is a legitimate
    // semantic gap, not what this test pins; distinct values bound the
    // divergence to one boundary customer per quintile edge
    val rows = (1 to 50).flatMap(k => (1 to k).map(_ =>
      (k.toLong,
        Timestamp.valueOf(f"2024-01-01 00:$k%02d:00"),
        100.0 * k)))
    val df = rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val exact = Rfm.scores(df, "o_custkey", "o_orderdate", "o_totalprice")
      .select("o_custkey", "segment").as[(Long, String)].collect().toMap
    val approx = Rfm.scores(df, "o_custkey", "o_orderdate", "o_totalprice",
      accuracy = Acc)
      .select("o_custkey", "segment").as[(Long, String)].collect().toMap
    assert(exact.keySet == approx.keySet)
    // compare digit-wise: 3 digits per customer, boundary flips only
    val digits = exact.toSeq.flatMap { case (k, seg) =>
      seg.zip(approx(k)).map { case (a, b) => a == b }
    }
    val agree = digits.count(identity)
    assert(agree >= (digits.size * 0.9).toInt,
      s"only $agree/${digits.size} score digits agree")
    // approx scores still span the grid
    assert(approx.values.flatMap(_.toSeq).toSet.size >= 4)
  }

  test("equiDepth: approx mode preserves total count and near-equal depth") {
    val df = (1 to 1000).map(i => i.toDouble * i).toDF("v") // skewed values
    val exact = Histogram.equiDepth(df, "v", 10)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    val approx = Histogram.equiDepth(df, "v", 10, accuracy = Acc)
      .select("bucket", "cnt").as[(Long, Long)].collect().toMap
    assert(exact.values.sum == 1000L && approx.values.sum == 1000L)
    assert(approx.keySet == (0L to 9L).toSet)
    // each approx bucket within a couple rows of the exact one (boundary
    // rows may shift one bucket when exact interpolation splits values)
    assert(approx.forall { case (b, c) => math.abs(c - exact(b)) <= 3 },
      s"exact=$exact approx=$approx")
  }
}
