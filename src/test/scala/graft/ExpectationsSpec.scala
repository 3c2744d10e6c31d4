package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Rule

/** Expectations audit/split: null-fails semantics, the partition
  * invariant, and the self-describing quarantine tags.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, String)](
    (10L, "ok"), (-3L, "ok"), (null, "ok"), (7L, null))
    .toDF("amount", "status")

  private val rules = Seq(
    Rule("amount_positive", col("amount") > 0),
    Rule("status_present", col("status").isNotNull))

  test("audit: one row per rule, nulls count as failures") {
    val got = Expectations.audit(df, rules)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // amount_positive: 10 ✓, -3 ✗, null ✗ (unknown certifies nothing), 7 ✓
    assert(got("amount_positive") == ((4L, 2L, 2L)))
    assert(got("status_present") == ((4L, 3L, 1L)))
  }

  test("split partitions the frame; quarantine names every failed rule") {
    val (clean, quarantine) = Expectations.split(df, rules)
    assert(clean.count() + quarantine.count() == df.count())
    assert(clean.collect().map(_.getLong(0)).toSet == Set(10L))
    val tags = quarantine
      .select(col("amount"), col("failed_rules"))
      .collect()
      .map(r => Option(r.get(0)) -> r.getSeq[String](1).toList).toMap
    assert(tags(Some(-3L)) == List("amount_positive"))
    assert(tags(None) == List("amount_positive"))
    assert(tags(Some(7L)) == List("status_present"))
  }

  test("audit is a pure plan — usable as a subquery, no action required") {
    // joinable/filterable lazily: would throw at analysis if audit collected
    val worst = Expectations.audit(df, rules)
      .orderBy(desc("n_fail"), col("rule")).limit(1)
    assert(worst.head().getString(0) == "amount_positive")
  }
}
