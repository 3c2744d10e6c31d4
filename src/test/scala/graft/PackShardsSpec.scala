package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Shard-packing contract: the distributed prefix-sum plan must equal the
  * sequential single-window definition row-for-row, and the bin bound
  * (shard mass < target + max single weight) must hold. The oracle gate
  * (corpus_shards) pins the same equivalence against DuckDB; this spec
  * pins it in-engine on a partition-hostile frame plus the mass bound.
  */
class PackShardsSpec extends SparkSpec {

  test("distributed prefix sum equals the sequential single-window packing") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, 1L + (i * 37) % 200))
      .toDF("doc_id", "w").repartition(13) // hostile partitioning
    val out = Sampling.packShards(docs, "doc_id", "w", nShards = 4,
      buckets = 16)
    // sequential reference: ONE global window in draw order
    val seqW = org.apache.spark.sql.expressions.Window
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = docs.agg(sum("w")).head().getLong(0)
    val target = (total + 3) / 4
    val ref = docs.withColumn("cum", sum(col("w")).over(seqW))
      .withColumn("shard_id", least(lit(3L),
        floor((col("cum") - col("w")) / target).cast("long")))
      .select("doc_id", "shard_id")
    val diff = out.select("doc_id", "shard_id").except(ref)
      .unionAll(ref.except(out.select("doc_id", "shard_id")))
    assert(diff.count() == 0)
  }

  test("every shard's mass stays under target + max single weight") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, 1L + (i * 131) % 997))
      .toDF("doc_id", "w")
    val n = 8
    val total = docs.agg(sum("w")).head().getLong(0)
    val target = (total + n - 1) / n
    val maxW = docs.agg(max("w")).head().getLong(0)
    val masses = Sampling.packShards(docs, "doc_id", "w", nShards = n)
      .groupBy("shard_id").agg(sum("w").as("mass"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(masses.keySet.max <= n - 1)
    masses.foreach { case (_, m) => assert(m < target + maxW) }
    assert(masses.values.sum == total)
  }
}
