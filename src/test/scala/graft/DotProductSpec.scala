package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** The codegen'd DotProduct expression must agree bit-for-bit with the
  * higher-order fold over both float and double arrays, handle nulls, and
  * be callable from SQL via the extension registration.
  */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == higher-order fold on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(100)
    val both = e.select(
      call_function("graft_dot", col("embedding"), col("embedding")).as("fast"),
      VectorFunctions.dot(col("embedding"), col("embedding")).as("fold"))
    assert(both.filter(col("fast") =!= col("fold")).isEmpty)
    assert(both.filter(col("fast").isNull).isEmpty)
  }

  test("null and length-mismatch semantics") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (Seq(1.0), Seq(3.0, 4.0))
    ).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("usable from SQL") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(2.0D, 2.0D)) AS d")
      .head.getDouble(0) == 6.0)
  }
}
