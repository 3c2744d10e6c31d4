package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must never change results — only the shuffle layout. */
class SkewSpec extends SparkSpec {

  test("salted count/sum == plain aggregation") {
    val li = Tables.lineitem(spark, sf())
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_value"))
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_quantity", salts = 16)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("salted join == plain join") {
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", salts = 8)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
