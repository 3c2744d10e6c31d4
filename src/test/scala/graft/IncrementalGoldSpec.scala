package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Gold, IssuesFromOrders}

/** Incremental mart maintenance must equal a full rebuild: split the
  * orders-derived silver into a base and a delta, build the mart on the
  * base, apply the delta incrementally, compare against the mart built on
  * everything.
  */
class IncrementalGoldSpec extends SparkSpec {

  private def same(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.sorted.map(col).toSeq
    a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
      b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty
  }

  test("incremental update == full rebuild") {
    val silver = IssuesFromOrders.issuesSilver(Tables.orders(spark, sf()))
    // delta: the newest 10% of issues (by id) — touches a subset of groups
    val cutoff = silver.agg(expr("percentile(issue_id, 0.9)")).head.getDouble(0)
    val base = silver.filter(col("issue_id") <= cutoff)
    val delta = silver.filter(col("issue_id") > cutoff)

    val prevMart = Gold.buildMarts(base).componentTier
    val incremental = Gold.incrementalMartUpdate(prevMart, silver, delta)
    val full = Gold.buildMarts(silver).componentTier
    assert(same(incremental, full))
  }

  test("untouched groups are not rescanned (delta touching one group)") {
    val silver = IssuesFromOrders.issuesSilver(Tables.orders(spark, sf()))
    // delta restricted to one group: urgent defects (component=other, P0)
    val delta = silver.filter(col("priority_tier") === "P0").limit(5)
    val prevMart = Gold.buildMarts(silver).componentTier
    val updated = Gold.incrementalMartUpdate(prevMart, silver, delta)
    // silver unchanged → update must be a no-op
    assert(same(updated, prevMart))
    // and the rebuilt portion covers exactly the touched group
    val groups = updated.filter(col("priority_tier") === "P0")
      .select("component").distinct().count()
    assert(groups >= 1)
  }
}
