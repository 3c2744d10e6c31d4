package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration metrics — the Gini coefficient per group via the
  * rank-weighted identity G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over
  * ascending-sorted values. The rank window is PARTITIONED by the group
  * (never a global sort); ties order on the id column so ranks are
  * engine-stable. Σx and Σ(i·xᵢ) route through decimal — exact integers
  * until the single closed-form double evaluation per group, the
  * [[Trend]] sufficient-statistics discipline.
  */
object Concentration {

  /** (group, n, total, gini) per group; value is summed per id first
    * (e.g. revenue per customer), then concentration is over those sums.
    */
  def gini(df: DataFrame, groupCol: String, idCol: String,
           valueCol: String): DataFrame = {
    val per = df.groupBy(groupCol, idCol)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("_x"))
    val w = Window.partitionBy(groupCol).orderBy(col("_x"), col(idCol))
    val ranked = per.withColumn("_i", row_number().over(w))
    val a = ranked.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(col("_x")).as("_s"),
      sum(col("_i").cast("decimal(18,0)") * col("_x")).as("_si"))
    val nD = col("n").cast("double")
    val sD = col("_s").cast("double")
    a.select(col(groupCol), col("n"), sD.as("total"),
      when(sD > 0,
        lit(2.0) * col("_si").cast("double") / (nD * sD) - (nD + 1.0) / nD)
        .otherwise(lit(null)).as("gini"))
  }
}
