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

  /** Cross-correlation function between two aligned series at lags
    * −maxLag..maxLag: ccf(k) = Σ_t (x_t−μx)(y_{t+k}−μy) /
    * √(Σ(x−μx)²·Σ(y−μy)²) — "does x LEAD y?" (a peak at positive k
    * means x now predicts y k steps later: clicks→purchases, errors→
    * churn). Statsmodels convention: full-series means and
    * normalization, so ccf is comparable across lags and |ccf| ≤ 1.
    *
    * Spark-first shape: NO window at all — the lag dimension folds into
    * an equi-join key. y is expanded lags×|y| with join key
    * bucket − k·step, then one equi-join against x on the bucket and one
    * (lag)-grouped aggregate. At 100 TB that is a hash join keyed on the
    * grid bucket — shuffle-parallel, AQE-managed — where a window
    * formulation would serialize each series into one partition. Means/
    * norms are two tiny single-row aggregates broadcast in.
    *
    * Exactness: integer-valued series → μ is one division of exact
    * integers, each deviation product multiplies identical doubles;
    * only the per-lag sums carry association noise, under 6-dp for the
    * bounded ratio.
    */
  def crosscorr(x: DataFrame, y: DataFrame, orderCol: String,
                valueCol: String, stepMicros: Long, maxLag: Int): DataFrame = {
    require(maxLag >= 0, "maxLag must be non-negative")
    require(stepMicros > 0, "stepMicros must be positive")
    val v = col(valueCol).cast("double")
    val xs = x.select(col(orderCol).as("_b"), v.as("_xv"))
    val ys = y.select(col(orderCol).as("_b"), v.as("_yv"))
    val xStats = xs.agg(
      (sum(col("_xv")) / count(lit(1))).as("_mx"),
      sum(col("_xv") * col("_xv")).as("_sxx"),
      sum(col("_xv")).as("_sx"), count(lit(1)).as("_nx"))
    val yStats = ys.agg(
      (sum(col("_yv")) / count(lit(1))).as("_my"),
      sum(col("_yv") * col("_yv")).as("_syy"),
      sum(col("_yv")).as("_sy"), count(lit(1)).as("_ny"))
    // Σ(x−μ)² = Σx² − n·μ² keeps the norm a single-expression derivation
    // of the same exact sums both engines hold
    val denX = col("_sxx") - col("_nx").cast("double") * col("_mx") * col("_mx")
    val denY = col("_syy") - col("_ny").cast("double") * col("_my") * col("_my")
    val lags = x.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .toDF("lag")
    val yExpanded = ys.crossJoin(broadcast(lags))
      .select(col("lag"), (col("_b") - col("lag") * stepMicros).as("_b"),
        col("_yv"))
    xs.join(yExpanded, Seq("_b"))
      .crossJoin(broadcast(xStats)).crossJoin(broadcast(yStats))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n_terms"),
        when(max(denX) > 0 && max(denY) > 0,
          sum((col("_xv") - col("_mx")) * (col("_yv") - col("_my"))) /
            sqrt(max(denX) * max(denY)))
          .otherwise(lit(null).cast("double")).as("ccf"))
  }
}
