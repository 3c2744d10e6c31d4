package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend (slope + intercept) over
  * INTEGRAL coordinates — "is this nation's monthly revenue growing, and
  * how fast": the closed-form fit y ≈ a·x + b from the classical
  * sufficient statistics
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
  *   intercept = (Σy − slope·Σx) / n.
  *
  * Why not `regr_slope`: its running float sums are association-order
  * dependent, so the same data can produce different last bits under
  * different partitionings — unacceptable for a replayable engine. Here
  * every sufficient statistic is an exact BIGINT sum (the caller supplies
  * integral x/y, e.g. month index and cents), commutative and
  * partitioning-proof; the ONLY float ops are the two final divisions,
  * identical on any engine given identical integer operands.
  *
  * Scale shape: one hash aggregate (map-side combined) per group — five
  * bigint sums, no window, no second pass. Overflow headroom is the
  * caller's contract: |Σxy| must fit a signed 64-bit long (month-index ×
  * cents at warehouse scale sits ~2^45, eight doublings of slack).
  *
  * Groups with < 2 points, or zero x-variance, have no defined line —
  * slope/intercept are null (NaN-free: the 0/0 is guarded, not divided).
  */
object Trend {

  def olsTrend(points: DataFrame, keyCols: Seq[String],
               xCol: String, yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "olsTrend requires at least one key column")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val agg = points.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"),
      sum(y).as("sy"),
      sum(x * y).as("sxy"),
      sum(x * x).as("sxx"))
    val denom = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      denom.cast("double")
    val slopeCol = when(col("n") >= 2 && denom =!= 0, slope)
    val interceptCol = when(col("n") >= 2 && denom =!= 0,
      (col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double"))
    agg.select(keyCols.map(col) ++ Seq(
      col("n"),
      slopeCol.as("slope"),
      interceptCol.as("intercept")): _*)
  }
}
