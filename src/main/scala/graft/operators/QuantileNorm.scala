package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group percentile-rank normalization — map every value to its
  * within-group percent_rank ∈ [0,1] so scores from differently-scaled
  * groups become comparable (the corpus-mixing normalizer: "is this doc
  * long FOR ITS SOURCE?", quality-score calibration across heterogeneous
  * crawls). Ties share the min-rank, SQL percent_rank semantics:
  * pr = (rank−1)/(n−1).
  *
  * The textbook `percent_rank() OVER (PARTITION BY g ORDER BY v)` sorts
  * every ROW of every group — a data-sized sort per group. This plans it
  * value-cardinality-sized instead: one hash agg to (group, value,
  * count), a window over THAT frame (per-group partitions of distinct
  * values only — the running-count prefix gives every tied row its min
  * rank), and one equi-join back on (group, value). The data is scanned
  * twice but never sorted; the join key is the same (group, value) hash
  * both sides. The only float op is the final (rank−1)/(n−1) division of
  * exact integers — identical on any engine.
  */
object QuantileNorm {

  /** Input columns pass through, plus `pr` (null for 1-row groups, SQL
    * percent_rank convention makes it 0 there — we follow SQL: 0.0).
    */
  def percentileRank(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val counts = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy(col(groupCol))
    val ranked = counts
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_n", sum(col("_c")).over(wg))
      // min rank of the tied block = running count BEFORE this value + 1
      .withColumn("_rank", col("_cum") - col("_c") + 1)
      .select(col(groupCol), col(valueCol),
        when(col("_n") > 1,
          (col("_rank") - 1).cast("double") /
            (col("_n") - 1).cast("double"))
          .otherwise(lit(0.0)).as("pr"))
    df.join(ranked, Seq(groupCol, valueCol))
  }
}
