package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Parquet footer aggregate pushdown (DSv2): COUNT/MIN/MAX answered from
  * row-group statistics without materializing a single data row — the
  * Spark-native sibling of VersionedTable's manifest-level
  * count()/min()/max() (X: pipe_meta_count). At 100 TB this turns a full
  * scan into a footer walk. Session-scoped conf flips inside the test and
  * restores after; the engine's declared queries never depend on it.
  */
class ParquetAggPushdownSpec extends SparkSpec {

  test("count/min/max push into the parquet footer under DSv2") {
    val conf = spark.conf
    val saved = Seq("spark.sql.sources.useV1SourceList",
      "spark.sql.parquet.aggregatePushdown").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.sources.useV1SourceList", "")   // parquet via DSv2
      conf.set("spark.sql.parquet.aggregatePushdown", "true")
      val df = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_k"),
          max(col("o_orderkey")).as("max_k"))
      val plan = df.queryExecution.explainString(FormattedMode)
      assert(plan.contains("PushedAggregation"), plan)
      assert(plan.contains("COUNT(*)") &&
        plan.contains("MIN(o_orderkey)") && plan.contains("MAX(o_orderkey)"),
        plan)
      // and the footer answers agree with the row-level truth
      val r = df.head
      val truth = Tables.orders(spark, sf("sf0.01"))
        .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey"))).head
      assert(r.getLong(0) == truth.getLong(0))
      assert(r.getLong(1) == truth.getLong(1))
      assert(r.getLong(2) == truth.getLong(2))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
