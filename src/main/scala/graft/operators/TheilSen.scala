package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend: per-group MEDIAN of all pairwise slopes
  * (y_j−y_i)/(t_j−t_i), t_i < t_j — the 29%-breakdown-point companion to
  * [[Trend.olsTrend]] (one wild month bends an OLS line; it moves the
  * median of C(n,2) slopes almost nowhere). Intercept follows the
  * standard med(y − m·t).
  *
  * The pair space is quadratic IN THE GROUP, so this operator is for the
  * aggregated-series regime — trend over per-key periodic rollups where
  * n is bounded (≤ a few thousand points ⇒ millions of pairs per group,
  * all shuffle-parallel); it is NOT for raw-event regression. The
  * self-join is group-keyed equi (never cartesian across groups), and
  * the input aggregate is the only data-sized pass.
  *
  * Exactness: slopes divide exact integers (t from calendar arithmetic,
  * y an exact count/sum), so each slope is the identical double on any
  * engine; both medians are Spark `percentile` ≡ DuckDB `quantile_cont`
  * (the repo-pinned equivalence), and the intercept residuals are one
  * multiply + subtract of identical operands.
  */
object TheilSen {

  /** Rows: (keys..., n_points, slope, intercept); groups with < 2 points
    * drop (no pair, no slope).
    */
  def medianSlope(series: DataFrame, keyCols: Seq[String], tCol: String,
                  yCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val base = series.select(
      keys ++ Seq(col(tCol).cast("long").as("_t"),
        col(yCol).cast("double").as("_y")): _*)
      .localCheckpoint(true) // both self-join sides + the residual pass
    val a = base.select(keys ++ Seq(col("_t").as("_t1"), col("_y").as("_y1")): _*)
    val b = base.select(keys ++ Seq(col("_t").as("_t2"), col("_y").as("_y2")): _*)
    val slopes = a.join(b, keyCols).filter(col("_t1") < col("_t2"))
      .select(keys ++ Seq(((col("_y2") - col("_y1")) /
        (col("_t2") - col("_t1")).cast("double")).as("_s")): _*)
    val m = slopes.groupBy(keys: _*)
      .agg(percentile(col("_s"), lit(0.5)).as("slope"))
    base.join(m, keyCols)
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_points"),
        min(col("slope")).as("slope"),
        percentile(col("_y") - col("slope") * col("_t").cast("double"),
          lit(0.5)).as("intercept"))
  }
}
