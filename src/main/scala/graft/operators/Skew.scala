package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys.
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]]) handles
  * most runtime skew; these are the explicit levers for the cases AQE can't
  * see — e.g. a pre-known hot grouping key, or a broadcast-infeasible join
  * against a skewed fact.
  *
  * Both are semantics-preserving for EXACT-typed aggregates — counts,
  * integer/decimal sums — where re-association cannot change the value
  * (equivalence-tested in SkewSpec, oracle-gated in ev_skewed_user_tally).
  * A two-phase sum over raw doubles changes float summation order and is
  * not bit-stable; route double sums through the decimal(18,s) pattern
  * (see RelationalQueries) before salting them.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style aggregates first at
    * (keys, salt) grain — spreading a hot key over `salts` reducers — then
    * re-combined at the keys grain. Use when one group holds a large share
    * of all rows (the classic power-law grouping key).
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(valueCol), monotonically_increasing_id()), lit(salts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }

  /** Salted equi-join for a skewed LEFT side against a non-broadcastable
    * right side: the left's hot keys are spread over `salts` sub-keys, and
    * the right side is replicated `salts`× so every sub-key still finds its
    * match. Replication factor is the explicit cost knob.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
