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

  test("fused graft_cos == composed dot/(|a||b|) bit-for-bit on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf("sf0.001")).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val both = pairs.select(
      call_function("graft_cos", col("va"), col("vb")).as("fused"),
      (call_function("graft_dot", col("va"), col("vb")) /
        nullif(sqrt(call_function("graft_dot", col("va"), col("va"))) *
          sqrt(call_function("graft_dot", col("vb"), col("vb"))), lit(0.0)))
        .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).isEmpty)
    assert(both.filter(col("fused").isNull =!= col("composed").isNull).isEmpty)
  }

  test("graft_cos zero-vector gives null; SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cos(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS c, " +
        "graft_cos(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS one")
      .head
    assert(r.isNullAt(0) && r.getDouble(1) == 1.0)
  }
}
