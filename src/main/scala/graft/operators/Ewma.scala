package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window exponentially weighted moving average — the smoothed
  * per-key signal used for drift and trend monitoring. The classic
  * recursive EWMA (s_t = αx_t + (1-α)s_{t-1}) needs unbounded history and
  * numerically explodes when unrolled via (1-α)^{-i} running sums; the
  * trailing-K form used here keeps the weights FIXED per lag offset
  * (w_j = α(1-α)^j, j = 0..k-1, renormalized over the lags that exist),
  * which makes it a pure lag-chain window expression: one shuffle on the
  * key, whole-stage-codegen'd arithmetic, no state carried beyond the
  * frame. For α not tiny the truncation error vs the infinite EWMA is
  * (1-α)^k — pick k so that's below the published rounding.
  *
  * Determinism: weights are Scala-computed doubles; [[weights]] exposes
  * them so the oracle SQL embeds the EXACT same constants via
  * Double.toString (parse roundtrips exactly), and the lag sum is a left
  * fold in both engines — identical IEEE754 op order. Ordering ties break
  * on the id column.
  */
object Ewma {

  def weights(alpha: Double, k: Int): Seq[Double] = {
    require(0.0 < alpha && alpha < 1.0, "need 0 < alpha < 1")
    require(k >= 1, "need k >= 1")
    (0 until k).map(j => alpha * math.pow(1.0 - alpha, j))
  }

  /** Per-row trailing EWMA of `valueCol` over the last k rows (inclusive)
    * per key, ordered by (tsCol, idCol). Appends an `ewma` column.
    */
  def trailing(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, alpha: Double, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val ws = weights(alpha, k)
    def lagJ(j: Int): Column =
      if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
    val num = ws.zipWithIndex.map { case (wj, j) =>
      lit(wj) * coalesce(lagJ(j), lit(0.0))
    }.reduceLeft(_ + _)
    val den = ws.zipWithIndex.map { case (wj, j) =>
      lit(wj) * when(lagJ(j).isNotNull, lit(1.0)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    df.withColumn("ewma", num / den)
  }
}
