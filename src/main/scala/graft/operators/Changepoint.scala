package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM mean-shift changepoint detection over a per-key time series —
  * "did this metric's level change, and when?" The statistic is the
  * classic normalized CUSUM range: with S_t = Σ_{i≤t}(x_i − μ),
  * max_t |S_t| / (σ·√n) peaks AT the shift point (before the shift the
  * partial sums drift one way, after it they drift back), so the argmax
  * bucket is the estimated changepoint and the height is the evidence
  * (≳1.36 ≈ 5% Kolmogorov critical value under no-change).
  *
  * Exactness: the input is an integer-valued series (bucket counts), so
  * the cumulative sum is an EXACT long prefix sum and every float
  * quantity is derived per row from exact integers and two shared
  * doubles (μ, σ): dev_t = cum_t − t·μ is one multiply + one subtract of
  * identical operands on any engine — there is NO floating-point
  * accumulation anywhere, so no association-order noise at all, and the
  * argmax equality compare is on bit-identical doubles.
  *
  * Scale shape: one hash aggregate for per-key (n, Σx, Σx²); one window
  * shuffle (partition by key, order by bucket) for the integer prefix
  * sum; one final per-key aggregate where a lexicographic struct-max
  * picks the argmax with a deterministic min-bucket tie-break (the
  * struct's second field is the NEGATED bucket, so among equal devs the
  * max struct carries the earliest bucket). The windowed frame is
  * bucket-grid-sized, not raw-event-sized.
  */
object Changepoint {

  /** Rows: (keys..., n_buckets, mu, sigma, cusum_stat, cp_bucket_us).
    * Constant series (σ = 0) report null stat and null changepoint.
    */
  def cusum(series: DataFrame, keyCols: Seq[String], orderCol: String,
            valueCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val stats = series.groupBy(keys: _*).agg(
      count(lit(1)).as("_n"),
      sum(col(valueCol)).as("_sx"),
      sum(col(valueCol) * col(valueCol)).as("_sxx"))
    val w = Window.partitionBy(keys: _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mu = col("_sx").cast("double") / col("_n").cast("double")
    val sigma = sqrt(col("_sxx").cast("double") / col("_n").cast("double")
      - mu * mu)
    val devAbs = abs(col("_cum").cast("double")
      - col("_t").cast("double") * col("_mu"))
    series
      .withColumn("_cum", sum(col(valueCol)).over(w)) // exact long prefix
      .withColumn("_t", count(lit(1)).over(w))
      .join(broadcast(stats.select(keys ++ Seq(col("_n"), mu.as("_mu"),
        sigma.as("_sigma")): _*)), keyCols)
      .withColumn("_dev", devAbs)
      .groupBy(keys: _*)
      .agg(
        max(col("_n")).as("n_buckets"),
        max(col("_mu")).as("mu"),
        max(col("_sigma")).as("sigma"),
        when(max(col("_sigma")) > 0,
          max(col("_dev")) / (max(col("_sigma")) *
            sqrt(max(col("_n")).cast("double"))))
          .otherwise(lit(null).cast("double")).as("cusum_stat"),
        when(max(col("_sigma")) > 0,
          -max(struct(col("_dev").as("_d"),
            (-col(orderCol)).as("_negb"))).getField("_negb"))
          .otherwise(lit(null).cast("long")).as("cp_bucket_us"))
  }
}
