package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Bucketed tables co-located on the join key must join without a shuffle
  * exchange — the write-time layout the engine prescribes for repeated
  * fact-fact joins at scale.
  */
class BucketSpec extends SparkSpec {

  test("bucketed fact-fact join plans without exchange") {
    Lakehouse.writeBucketed(
      Tables.orders(spark, sf()).select("o_orderkey", "o_orderpriority"),
      "b_orders", nBuckets = 8, bucketCols = Seq("o_orderkey"))
    Lakehouse.writeBucketed(
      Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity"),
      "b_lineitem", nBuckets = 8, bucketCols = Seq("l_orderkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.explainString(FormattedMode)
      assert(plan.contains("SortMergeJoin"))
      // bucketing replaces both join-side shuffles; the only exchange left
      // is the final single-column aggregation
      assert(!plan.contains("hashpartitioning(l_orderkey") &&
        !plan.contains("hashpartitioning(o_orderkey"))
      assert(joined.count() > 0)

      val unbucketed = Tables.lineitem(spark, sf())
        .join(Tables.orders(spark, sf()),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("l_quantity")).as("qty"))
      assert(joined.exceptAll(unbucketed).isEmpty &&
        unbucketed.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
