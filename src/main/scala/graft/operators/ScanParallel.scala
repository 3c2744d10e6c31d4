package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive remedy for UNDER-PARALLEL scans feeding per-row-heavy
  * map work (optimization guide §2.5, "input skew": one huge unsplittable
  * file — parquet scan parallelism is bounded by row groups, and a
  * single-row-group file is ONE task no matter how many cores the session
  * has; the driver's test tables ship exactly that shape, so every
  * tokenize/shingle/hash pass ran on 1 of N cores until its first
  * exchange).
  *
  * [[fanOut]] hash-repartitions the projected input to the session's
  * default parallelism ONLY when the scan is actually under-parallel
  * (fewer than half the session's cores' worth of partitions). At 100 TB
  * an input carries thousands of row groups, the condition is false and
  * this is a no-op — the repartition never appears in the cluster-scale
  * plan, so no corpus-sized payload shuffle is introduced where the scan
  * already parallelizes. Hash partitioning on a caller-supplied
  * high-cardinality key (doc id) keeps the exchange DETERMINISTIC under
  * task retries (guide §2.5 warns off round-robin/rand-derived keys, and
  * keyless round-robin pays a local sort per SPARK-23207); callers
  * project down to exactly the columns the map pass needs first, so the
  * one small-corpus exchange moves only those bytes (guide §2.3).
  */
object ScanParallel {

  /** Repartition `df` by `keys` to the session default parallelism when
    * its current plan yields fewer than half that many partitions;
    * identity otherwise. Row-set is unchanged — only physical layout.
    *
    * The partition probe (`df.rdd.getNumPartitions`) is only safe on an
    * EXCHANGE-FREE plan: with AQE on, `Dataset.rdd` over a plan that
    * contains an exchange goes through `AdaptiveSparkPlanExec.doExecute`,
    * which EXECUTES every upstream query stage eagerly — the probe itself
    * would run the query. A plan that already carries an exchange is also
    * exactly the case fanOut has nothing to fix (its downstream is
    * already partitioned by `spark.sql.shuffle.partitions`), so such
    * inputs pass through untouched.
    */
  def fanOut(df: DataFrame, keys: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "fanOut needs a deterministic partition key")
    val target = df.sparkSession.sparkContext.defaultParallelism
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange || target <= 1) return df
    val parts = df.rdd.getNumPartitions // exchange-free: lazy, no job
    if (parts * 2 >= target) df
    else df.repartition(target, keys: _*)
  }
}
