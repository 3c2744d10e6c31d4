package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Winsorized (percentile-clipped) statistics per group — the robust-mean
  * idiom: clip values into the group's [lo, hi] exact interpolated
  * percentiles, then aggregate, so a handful of fat-finger outliers can't
  * drag the mean. Two passes by construction (the bounds ARE group
  * aggregates): one percentile aggregate at group grain (output is
  * group-count-sized, broadcast back), one clipped aggregate over the
  * data. Exact `percentile` sorts each group's values inside the agg
  * buffer — the audit-grade choice; swap `percentile_approx` in for
  * groups too large to buffer, same plan shape.
  *
  * Float discipline: the clipped mean routes through decimal(18,2) cents
  * so the sum is association-order exact; the only raw-double ops are the
  * percentile interpolation and the final divide, identical cross-engine
  * (DuckDB quantile_cont interpolates the same way — pinned by the
  * rel_percentiles gate).
  */
object Winsorize {

  def winsorizedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                      lo: Double, hi: Double): DataFrame = {
    require(keys.nonEmpty, "winsorizedStats requires grouping keys")
    require(0.0 <= lo && lo < hi && hi <= 1.0, "need 0 <= lo < hi <= 1")
    val v = col(valueCol)
    val bounds = df.groupBy(keys.map(col): _*).agg(
      percentile(v, lit(lo)).as("_lo"),
      percentile(v, lit(hi)).as("_hi"))
    val clipped = df.join(broadcast(bounds), keys)
      .withColumn("_cv", least(greatest(v, col("_lo")), col("_hi")))
    clipped.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("_cv").cast("decimal(18,2)")).cast("double").as("sum_clipped"),
      (sum(col("_cv").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("mean_clipped"),
      min(col("_lo")).as("p_lo"),
      min(col("_hi")).as("p_hi"))
  }
}
