package graft

import java.nio.file.Files

import graft.sources.PartitionedVersionedTable

/** Partition-pruned MERGE: an upsert touching one partition must not open
  * (or version-bump) any other partition's log.
  */
class PartitionedVersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, String, Long)*) =
    rows.toDF("id", "repo", "payload", "updated_at")

  test("merge rewrites only the touched partition; others keep version AND data") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df(
      (1L, "a", "a1", 10L), (2L, "a", "a2", 10L), (3L, "b", "b1", 10L)))
    assert(pvt.partitions == Seq("a", "b"))
    val vb0 = pvt.partition("b").latestVersion.get

    pvt.merge(df((1L, "a", "a1-new", 20L)), Seq("id"), "updated_at")

    // partition a advanced, partition b untouched (same version number)
    assert(pvt.partition("a").latestVersion.get == 1L)
    assert(pvt.partition("b").latestVersion.get == vb0)
    val out = pvt.read().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(out == Map(1L -> "a1-new", 2L -> "a2", 3L -> "b1"))
  }

  test("per-partition history supports time travel independently") {
    val root = Files.createTempDirectory("pvt2").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df((1L, "a", "v0", 1L)))
    pvt.merge(df((1L, "a", "v1", 2L)), Seq("id"), "updated_at")
    assert(pvt.partition("a").readVersion(0)
      .collect().head.getAs[String]("payload") == "v0")
    assert(pvt.read().collect().head.getAs[String]("payload") == "v1")
  }
}
