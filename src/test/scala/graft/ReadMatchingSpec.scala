package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Dimension-driven fact pruning ([[VersionedTable.readMatching]]): the
  * bloom pass must prune an append-mostly table whose every dir spans the
  * full key range (where min/max alone keeps everything), the envelope
  * pass must prune a range-clustered table, and the semi-join must keep
  * results exact either way.
  */
class ReadMatchingSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("vt_match").resolve("tbl").toString

  test("bloom pass prunes an append-mostly table; rows stay exact") {
    import spark.implicits._
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("k"), bloomCols = Seq("k"))
    // four appends, each spanning the FULL key range (k % 4 buckets):
    // the stats envelope keeps all four dirs for any key set
    (0 until 4).foreach { i =>
      vt.append((0L until 400L).filter(_ % 4 == i).map(k => (k, s"p$k"))
        .toDF("k", "p"))
    }
    // keys all come from bucket 1 (k % 4 == 1) — blooms should drop the
    // other three dirs (deterministic data → deterministic outcome;
    // a false positive would cost one extra dir, not a wrong row)
    val keys = Seq(1L, 101L, 201L, 301L).toDF("k")
    val dirs = vt.matchingDirs(keys, "k")
    assert(dirs.size < 4, s"bloom pass pruned nothing: $dirs")
    val out = vt.readMatching(keys, "k").select("k").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 101L, 201L, 301L))
  }

  test("stats envelope prunes a range-clustered table; too-big key sets degrade safely") {
    import spark.implicits._
    val vt = new VersionedTable(spark, freshRoot(), statsCols = Seq("k"))
    (0 until 4).foreach { i =>
      vt.append((i * 100L until (i + 1) * 100L).map(k => (k, s"p$k")).toDF("k", "p"))
    }
    val keys = Seq(10L, 50L, 90L).toDF("k") // all in dir 0's range
    assert(vt.matchingDirs(keys, "k").size == 1)
    assert(vt.readMatching(keys, "k").count() == 3)
    // maxProbeKeys = 0 forces the envelope-only path
    assert(vt.matchingDirs(keys, "k", maxProbeKeys = 0).size == 1)
    // all-null key set matches nothing and opens nothing
    val nullKeys = Seq[Option[Long]](None).toDF("k")
    assert(vt.matchingDirs(nullKeys, "k").isEmpty)
    assert(vt.readMatching(nullKeys, "k").count() == 0)
  }

  test("scanReport explains pruning without reading data") {
    import spark.implicits._
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("k"), fileStats = true)
    (0 until 3).foreach { i =>
      vt.append((i * 100L until (i + 1) * 100L).map(k => (k, s"p$k"))
        .toDF("k", "p").repartition(2))
    }
    val rep = vt.scanReport(col("k") >= 250L)
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
    assert(rep.length == 3)
    assert(rep.count(_._2) == 1)              // one dir opened
    assert(rep.filter(!_._2).forall(_._3 == 100L)) // pruned dirs keep ledger rows
    // file-grain: the opened dir has a sidecar and opens a file subset
    val opened = vt.scanReport(col("k") >= 250L)
      .filter(col("opened")).head()
    assert(opened.getLong(3) == 2L)           // files_total from sidecar
    assert(opened.getLong(4) >= 1L && opened.getLong(4) <= 2L)
  }

  test("readMatching speaks logical names through a rename") {
    import spark.implicits._
    val vt = new VersionedTable(spark, freshRoot(), statsCols = Seq("k"))
    (0 until 4).foreach { i =>
      vt.append((i * 100L until (i + 1) * 100L).map(k => (k, s"p$k")).toDF("k", "p"))
    }
    vt.renameColumn("k", "key")
    // both keys inside dir 0's range — the [min,max] envelope prunes the
    // other three (a spread key set needs the bloom pass, test 1)
    val keys = Seq(10L, 50L).toDF("key")
    assert(vt.matchingDirs(keys, "key").size == 1)
    val out = vt.readMatching(keys, "key")
    assert(out.columns.toSeq == Seq("key", "p"))
    assert(out.count() == 2)
  }
}
