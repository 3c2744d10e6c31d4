package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key autocorrelation function (ACF) at lags 1..maxLag — the
  * seasonality / self-similarity diagnostic behind forecast-model choice
  * and bot-traffic detection (a strong lag-24 ACF on an hourly series is
  * a daily cycle; a near-1 lag-1 ACF is a random walk).
  *
  * Definition: the standard sample ACF — numerator Σ_{t>k}(x_t−μ)(x_{t−k}−μ),
  * denominator Σ_t(x_t−μ)² over the FULL series (one shared normalization,
  * so acf(k) is comparable across lags and bounded by ±1; this is the
  * statsmodels/R `acf` convention, not a per-lag Pearson correlation).
  *
  * Exactness: the caller feeds an integer-valued series (bucket counts),
  * so μ is one division of exact integers — identical IEEE754 on any
  * engine — and every deviation product is a product of identical
  * doubles. Only the final sums carry association-order noise, far below
  * the published 6-dp rounding for bounded ratios.
  *
  * Scale shape: ONE window shuffle (partition by key, order by bucket)
  * computes every lag column in the same pass; the mean join is a
  * broadcast of a key-cardinality frame; the final aggregate emits one
  * row per (key, lag). The series frame (typically the output of
  * [[Resample.gapFilledCounts]] — ACF over a sparse series with silent
  * gaps is WRONG, gaps must exist as zeros) is data-sized only in the
  * bucket grid, not the raw events.
  */
object Acf {

  /** Rows: (keyCols..., lag, n_terms, acf); acf null for a constant
    * series (zero variance) rather than NaN.
    */
  def autocorr(series: DataFrame, keyCols: Seq[String], orderCol: String,
               valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "need at least lag 1")
    val keys = keyCols.map(col)
    val mu = series.groupBy(keys: _*)
      .agg((sum(col(valueCol)).cast("double") / count(lit(1)).cast("double"))
        .as("_mu"))
    val w = Window.partitionBy(keys: _*).orderBy(col(orderCol))
    val withLags = (1 to maxLag).foldLeft(
      series.join(broadcast(mu), keyCols)
        .withColumn("_dev", col(valueCol).cast("double") - col("_mu"))) {
      (d, k) => d.withColumn(s"_dl$k", lag(col("_dev"), k).over(w))
    }
    val aggs =
      sum(col("_dev") * col("_dev")).as("_den") +:
        (1 to maxLag).flatMap(k => Seq(
          sum(col("_dev") * col(s"_dl$k")).as(s"_num$k"),
          count(col(s"_dl$k")).as(s"_n$k")))
    val perKey = withLags.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    // unpivot (lag, num, n_terms) triples; stack keeps this one projection
    val stacked = perKey.select(keys ++ Seq(col("_den"),
      expr(s"stack($maxLag, ${(1 to maxLag)
        .map(k => s"$k, _num$k, _n$k").mkString(", ")})")
        .as(Seq("lag", "_num", "n_terms"))): _*)
    stacked.select(keys ++ Seq(col("lag"), col("n_terms"),
      when(col("_den") > 0, col("_num") / col("_den"))
        .otherwise(lit(null).cast("double")).as("acf")): _*)
  }
}
