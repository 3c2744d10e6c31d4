package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, Sampling}

/** Banded range join == brute-force inequality join (equivalence at test
  * scale), boundary inclusivity, and the no-cross-product plan guarantee.
  * Plus the deterministic-sampling contracts.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded pairs == brute-force range filter (events, ±10 min, per user)") {
    val ev = Tables.events(spark, sf())
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("ce"))
    val banded = RangeJoin.byTimestamp(p,
        ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id"),
        tsCol = "ts", deltaSeconds = 600L, keyCols = Seq("user_id"))
      .select(col("event_id"), col("r_event_id"))
    val brute = p.join(c, col("user_id") === col("cu") &&
        abs(col("ts").cast("double") - col("cts").cast("double")) <= 600.0)
      .select(col("event_id"), col("ce").as("r_event_id"))
    assert(banded.count() == brute.count())
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    assert(banded.count() > 0)
  }

  test("band boundary is inclusive and pairs are emitted exactly once") {
    val l = Seq((1L, 100.0)).toDF("id", "ts")
    val r = Seq((10L, 40.0), (11L, 160.0), (12L, 161.0), (13L, 100.0))
      .toDF("rid", "ts")
    val out = RangeJoin.byTimestamp(l, r, "ts", 60L)
      .select("r_rid").as[Long].collect().sorted
    assert(out.toSeq == Seq(10L, 11L, 13L)) // 161 is 61s away; 40 exactly 60s
  }

  test("range-join plan is an equi-join on the bin — no cartesian/BNLJ") {
    val plan = SparkEntry.all("ev_range_join").build(spark, sf("sf0.01"))
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("hash sampling is deterministic, a subset, and roughly at rate") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val s1 = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id")
    val s2 = Sampling.hashSample(docs, "doc_id", 0.5).select("doc_id")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    val n = docs.count().toDouble
    val k = s1.count().toDouble
    assert(k > n * 0.35 && k < n * 0.65) // loose: 500 draws at p=0.5
    // lower rate samples nest inside higher ones (same coin, lower cut)
    val s3 = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id")
    assert(s3.exceptAll(s1).isEmpty)
  }

  test("stratified sampling leaves unlisted strata untouched") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val mixed = Sampling.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.0))
    assert(mixed.filter(col("lang") === "en").count() == 0)
    assert(mixed.filter(col("lang") =!= "en").count() ==
      docs.filter(col("lang") =!= "en").count())
  }
}
