package graft

import org.apache.spark.sql.functions._

import graft.functions.WeightedMean

class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator == expression weighted mean") {
    val data = Seq((75.0, 2.0), (30.0, 1.0)).toDS()
    val typedResult = data.select(WeightedMean.toColumn).head()
    assert(math.abs(typedResult - 60.0) < 1e-12)

    val exprResult = data.toDF("x", "w")
      .agg((sum(col("x") * col("w")) / sum(col("w"))).as("wm"))
      .head.getDouble(0)
    assert(typedResult == exprResult)
  }

  test("zero total weight → NaN (the closure's None)") {
    val empty = Seq.empty[(Double, Double)].toDS()
    assert(empty.select(WeightedMean.toColumn).head().isNaN)
  }
}
