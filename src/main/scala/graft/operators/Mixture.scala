package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget WATER-FILLING across sources — the allocation problem at
  * the top of every pretraining data recipe: given per-source available
  * token counts a_i and target weights w_i, spend a total budget T as
  * t_i = min(a_i, λ·w_i) with one global water level λ chosen so the
  * budget is exhausted. Small sources saturate (capped at everything they
  * have); the remainder splits across the rest in proportion to weight.
  *
  * The capped set is exactly {i : a_i/w_i ≤ λ} — a PREFIX of the sources
  * sorted by a_i/w_i — so the level is found closed-form, no iteration:
  * running (Σa, Σw) prefixes down the sorted frame, a source caps iff
  * a_j·W_j ≤ R_j·w_j where R_j/W_j are the budget and weight left after
  * the sources before it capped; the first failure ends the prefix, and
  * λ = R/W of the surviving suffix.
  *
  * Scale note: this operates on the per-SOURCE frame — a dimension of k
  * rows, not data — so the unpartitioned windows here hold k rows on one
  * task and are fine at any corpus size; the corpus-sized work is the one
  * upstream token-count aggregate the caller provides. Double prefix sums
  * run in the same (ratio, source) order on both engines; frame-wide
  * totals come from order-insensitive max-of-prefix, so the oracle
  * replays bit-for-bit.
  */
object Mixture {

  def waterfill(perSource: DataFrame, srcCol: String, availCol: String,
                weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val base = perSource.select(col(srcCol).as("source"),
      col(availCol).cast("long").as("avail_tokens"),
      col(weightCol).cast("double").as("_w"))
      .withColumn("_ratio",
        col("avail_tokens").cast("double") / col("_w"))
    val ord = Window.orderBy(col("_ratio"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val c = base
      .withColumn("_cum_a", sum(col("avail_tokens")).over(ord))
      .withColumn("_cum_w", sum(col("_w")).over(ord))
      .withColumn("_tot_w", max(col("_cum_w")).over(all))
      .withColumn("_cap", when(
        col("avail_tokens").cast("double") *
          (col("_tot_w") - (col("_cum_w") - col("_w"))) <=
          (lit(budget.toDouble) -
            (col("_cum_a") - col("avail_tokens")).cast("double")) * col("_w"),
        1).otherwise(0))
      // the capped set is a prefix in ratio order: min-so-far turns 0 at
      // the first failure and stays 0
      .withColumn("_in_cap", min(col("_cap")).over(ord))
      .withColumn("_cap_a",
        max(when(col("_in_cap") === 1, col("_cum_a")).otherwise(0L)).over(all))
      .withColumn("_cap_w",
        max(when(col("_in_cap") === 1, col("_cum_w")).otherwise(0.0)).over(all))
    val lambda = (lit(budget.toDouble) - col("_cap_a").cast("double")) /
      (col("_tot_w") - col("_cap_w"))
    c.select(col("source"), col("avail_tokens"),
      round(col("_w"), 6).as("weight"),
      when(col("_in_cap") === 1, col("avail_tokens").cast("double"))
        .otherwise(round(col("_w") * lambda, 6)).as("allocated"),
      col("_in_cap").as("capped"))
  }
}
