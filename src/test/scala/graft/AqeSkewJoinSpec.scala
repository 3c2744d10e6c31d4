package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling — the runtime half of the skew story (the
  * static half is [[graft.operators.Skew]]'s salting). A hot key that
  * dwarfs every other shuffle partition must be SPLIT by adaptive
  * execution, not serialized through one reducer: at 100 TB this is the
  * difference between a straggler-free join and a job pinned on one task.
  * Thresholds are forced low so the behavior is observable at test scale;
  * the mechanism exercised is exactly the production one.
  */
class AqeSkewJoinSpec extends SparkSpec {

  import spark.implicits._

  test("hot-key shuffle join splits the skewed partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // key 0 carries ~100x the mass of any other key
      val left = ((1 to 60000).map(i => (0L, s"hot-$i")) ++
        (1 to 50).flatMap(k => (1 to 600).map(i => (k.toLong, s"k$k-$i"))))
        .toDF("k", "payload")
      val right = (0 to 50).map(k => (k.toLong, s"dim$k")).toDF("k", "name")

      val joined = left.join(right, "k")
      // collect() drives joined's OWN QueryExecution (count() would build
      // a different one and leave this plan unexecuted / non-final)
      val n = joined.collect().length
      assert(n == 60000 + 50 * 600)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(400))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot-key join skew=true:\n${plan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
