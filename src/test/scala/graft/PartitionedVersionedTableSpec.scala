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

  test("partitioned merge delete arms: sync deletes reach untouched partitions via pruning") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df(
      (1L, "a", "keep", 10L), (2L, "a", "stale", 10L),
      (3L, "b", "stale", 10L), (4L, "c", "keep", 10L)))
    val vc0 = pvt.partition("c").latestVersion.get
    // updates touch only partition a; the sync arm deletes unmatched
    // 'stale' rows EVERYWHERE — including partition b, which receives no
    // updates; partition c has no cond-true rows and only no-op-commits
    pvt.merge(df((1L, "a", "keep-2", 20L)), Seq("id"), "updated_at",
      deleteNotMatchedBySource = Some(col("payload") === "stale"))
    val out = pvt.read().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(out == Map(1L -> "keep-2", 4L -> "keep"))
    // c's delete was a no-op commit (content untouched)
    assert(pvt.partition("c").read().count() == 1)
    assert(pvt.partition("c").latestVersion.get == vc0 + 1)
    // WHEN MATCHED DELETE arm passes through per partition
    pvt.merge(df((4L, "c", "drop-me", 30L)), Seq("id"), "updated_at",
      deleteWhen = Some(col("payload") === "drop-me"))
    assert(pvt.read().collect().map(_.getAs[Long]("id")).toSet == Set(1L))
  }

  test("readWhere opens only predicate-matched partitions; results stay exact") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df(
      (1L, "alpha", "a1", 10L), (2L, "alpha", "a2", 10L),
      (3L, "beta", "b1", 10L), (4L, "gamma", "g1", 10L)))
    // equality on the partition column opens exactly one log
    assert(pvt.partitionsFor(col("repo") === "beta") == Seq("beta"))
    // prefix and IN prune too (IN via its envelope)
    assert(pvt.partitionsFor(col("repo").startsWith("al")) == Seq("alpha"))
    assert(pvt.partitionsFor(col("repo").isin("alpha", "beta")) == Seq("alpha", "beta"))
    // non-partition predicates open everything, never drop rows
    assert(pvt.partitionsFor(col("id") > 2L).size == 3)
    // OR of partition equalities unions the partition sets
    assert(pvt.partitionsFor(col("repo") === "alpha" || col("repo") === "gamma")
      == Seq("alpha", "gamma"))
    // OR with a non-partition disjunct cannot prune
    assert(pvt.partitionsFor(col("repo") === "alpha" || col("id") === 3L).size == 3)
    // NOT-equality drops exactly the named partition; rows stay correct
    assert(pvt.partitionsFor(col("repo") =!= "beta") == Seq("alpha", "gamma"))
    assert(pvt.readWhere(col("repo") =!= "beta").count() == 3L)
    // De Morgan over partition disjuncts: NOT(a OR g) keeps only beta
    assert(pvt.partitionsFor(!(col("repo") === "alpha" || col("repo") === "gamma"))
      == Seq("beta"))
    val got = pvt.readWhere(col("repo") === "alpha" && col("id") === 2L)
      .select("payload").collect().map(_.getString(0)).toSeq
    assert(got == Seq("a2"))
    // a no-match predicate returns an empty frame with the right schema
    assert(pvt.readWhere(col("repo") === "nope").isEmpty)
  }

  test("metadataCount sums partition ledgers; one declining partition declines all") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df(
      (1L, "a", "a1", 10L), (2L, "a", "a2", 10L), (3L, "b", "b1", 10L)))
    assert(pvt.metadataCount().contains(3L))
    pvt.merge(df((4L, "b", "b2", 20L)), Seq("id"), "updated_at")
    assert(pvt.metadataCount().contains(4L))
    // a DV delete inside ONE partition makes the whole answer inexact
    import org.apache.spark.sql.functions.col
    pvt.partition("a").delete(col("id") === 1L, useDeletionVectors = true)
    assert(pvt.metadataCount().isEmpty)
    pvt.partition("a").compact()
    assert(pvt.metadataCount().contains(3L))
  }

  test("CHECK constraints reject the WHOLE frame before any partition commits") {
    val root = Files.createTempDirectory("pvt_ck").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo",
      Seq("nonneg_ts" -> "updated_at >= 0"))
    pvt.overwrite(df((1L, "a", "a1", 10L), (2L, "b", "b1", 10L)))
    val before = pvt.partitions.map(v => v -> pvt.partition(v).latestVersion.get)

    // one bad row in partition b must abort the multi-partition merge
    // all-or-nothing: partition a (whose slice is clean) must NOT commit
    intercept[graft.sources.VersionedTable.ConstraintViolationException] {
      pvt.merge(df((1L, "a", "ok", 20L), (2L, "b", "bad", -1L)),
        Seq("id"), "updated_at")
    }
    assert(pvt.partitions.map(v => v -> pvt.partition(v).latestVersion.get) == before)
    assert(pvt.read().collect().map(_.getAs[String]("payload")).toSet == Set("a1", "b1"))

    // direct partition handles are enforced too
    intercept[graft.sources.VersionedTable.ConstraintViolationException] {
      pvt.partition("a").append(df((9L, "a", "x", -3L)))
    }
  }

  test("cross-partition snapshots: consistent reads, immune to later commits") {
    val root = Files.createTempDirectory("pvt3").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    val s0 = pvt.overwrite(df(
      (1L, "a", "a1", 10L), (3L, "b", "b1", 10L)))
    val s1 = pvt.merge(df(
      (1L, "a", "a1-new", 20L), (3L, "b", "b1-new", 20L)), Seq("id"), "updated_at")
    assert(pvt.snapshots == Seq(s0, s1) && s0 == 0L && s1 == 1L)
    // snapshot 0 reads the ORIGINAL state of both partitions even after
    // the later merge advanced them
    val at0 = pvt.readSnapshot(s0).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(at0 == Map(1L -> "a1", 3L -> "b1"))
    val at1 = pvt.readSnapshot(s1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(at1 == Map(1L -> "a1-new", 3L -> "b1-new"))
    // the vector records BOTH partitions at each snapshot
    assert(pvt.snapshotVersions(s1).keySet == Set("a", "b"))
  }

  test("a partition commit outside the coordinator is invisible to existing snapshots") {
    val root = Files.createTempDirectory("pvt4").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    val s0 = pvt.overwrite(df((1L, "a", "a1", 10L), (3L, "b", "b1", 10L)))
    // simulate a crash mid-operation / rogue writer: partition b advances
    // WITHOUT a snapshot commit
    pvt.partition("b").merge(
      Seq((3L, "b", "b1-direct", 99L)).toDF("id", "repo", "payload", "updated_at"),
      Seq("id"), "updated_at")
    // latest-read sees it; the snapshot does not (all-or-nothing visibility)
    assert(pvt.read().collect().map(_.getAs[String]("payload")).toSet
      .contains("b1-direct"))
    assert(pvt.readSnapshot(s0).collect()
      .map(_.getAs[String]("payload")).toSet == Set("a1", "b1"))
    // the NEXT coordinated commit freezes b at its now-latest version
    val s1 = pvt.merge(df((1L, "a", "a2", 30L)), Seq("id"), "updated_at")
    assert(pvt.readSnapshot(s1).collect()
      .map(_.getAs[String]("payload")).toSet == Set("a2", "b1-direct"))
  }

  test("snapshot-aware vacuum keeps exactly the versions live snapshots pin") {
    val root = Files.createTempDirectory("pvt5").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    val s0 = pvt.overwrite(df((1L, "a", "v0", 10L), (3L, "b", "w0", 10L)))
    val s1 = pvt.merge(df((1L, "a", "v1", 20L)), Seq("id"), "updated_at")
    val s2 = pvt.merge(df((1L, "a", "v2", 30L), (3L, "b", "w2", 30L)),
      Seq("id"), "updated_at")
    pvt.vacuum(keepSnapshots = 2, orphanRetentionMs = 0L)
    assert(pvt.snapshots == Seq(s1, s2))
    // kept snapshots still read consistently...
    assert(pvt.readSnapshot(s1).collect()
      .map(_.getAs[String]("payload")).toSet == Set("v1", "w0"))
    assert(pvt.readSnapshot(s2).collect()
      .map(_.getAs[String]("payload")).toSet == Set("v2", "w2"))
    // ...note s1 pins partition b's ORIGINAL version (b untouched by s1's
    // merge), so the keep-set vacuum preserved it even though a 2-version
    // count-based vacuum of partition b would have dropped it
    intercept[Exception] { pvt.readSnapshot(s0).collect() }
    // partition a's unpinned v0 is gone
    intercept[Exception] { pvt.partition("a").readVersion(0L).collect() }
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

  test("hinted DELETE/UPDATE touch only the named partition logs") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("pvt_dml").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df(
      (1L, "a", "a1", 10L), (2L, "a", "a2", 10L), (3L, "b", "b1", 10L)))
    val vb0 = pvt.partition("b").latestVersion.get

    // hinted delete: partition b's log is not even version-bumped
    val s1 = pvt.delete(col("id") === 2L, partitionsHint = Seq("a"))
    assert(pvt.partition("b").latestVersion.get == vb0)
    assert(pvt.readSnapshot(s1).collect().map(_.getAs[Long]("id")).sorted
      .toSeq == Seq(1L, 3L))

    // DV delete through the wrapper: no data rewrite in the partition
    val dirsB = pvt.partition("b").manifestOf(vb0).dataDirs
    pvt.delete(col("id") === 3L, useDeletionVectors = true,
      partitionsHint = Seq("b"))
    val mB = pvt.partition("b")
    assert(mB.manifestOf(mB.latestVersion.get).dataDirs == dirsB &&
      mB.manifestOf(mB.latestVersion.get).dvs.size == 1)
    assert(pvt.read().collect().map(_.getAs[Long]("id")).toSeq == Seq(1L))

    // update: partition-column assignment rejected; hinted update applies
    intercept[IllegalArgumentException] {
      pvt.update(col("id") === 1L, Map("repo" -> lit("c")))
    }
    val s3 = pvt.update(col("id") === 1L, Map("payload" -> lit("a1!")),
      partitionsHint = Seq("a"))
    assert(pvt.readSnapshot(s3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
      == Map(1L -> "a1!"))
  }

  // X73/X98 parity through the per-partition merge path (X104): carried
  // member dirs must keep their EXACT stats entries, mirroring the flat
  // VersionedTableSpec carry cases.
  test("partitioned merge carries untouched member dirs with exact stats") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = new PartitionedVersionedTable(spark, root, "repo",
      memberStatsCols = Seq("updated_at"))
    pvt.overwrite(df(
      (1L, "a", "a1", 10L), (2L, "a", "a2", 19L), (9L, "b", "b1", 10L)))
    pvt.append(df((3L, "a", "a3", 20L), (4L, "a", "a4", 29L)))
    pvt.append(df((5L, "a", "a5", 30L), (6L, "a", "a6", 39L)))
    val ma = pvt.partition("a")
    val before = ma.history().head
    val vb0 = pvt.partition("b").latestVersion.get
    // touches only id 5 (partition a's last dir); id 7 is an insert
    pvt.merge(df((5L, "a", "a5-new", 100L), (7L, "a", "a7", 100L)),
      Seq("id"), "updated_at")
    val after = ma.history().head
    assert(after.dataDirs.take(2) == before.dataDirs.take(2),
      "the two unmatched member dirs must be REUSED (same paths)")
    assert(!after.dataDirs.contains(before.dataDirs(2)))
    before.dataDirs.take(2).foreach { d =>
      assert(after.stats.get(d) == before.stats.get(d),
        s"carried member dir $d must keep its exact stats entry")
    }
    // the untouched partition's log never advanced
    assert(pvt.partition("b").latestVersion.get == vb0)
    val out = pvt.read().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("payload")).toMap
    assert(out == Map(1L -> "a1", 2L -> "a2", 3L -> "a3", 4L -> "a4",
      5L -> "a5-new", 6L -> "a6", 7L -> "a7", 9L -> "b1"))
  }

  test("bloom sidecars carry through partitioned merge; rewritten dir gets fresh blooms") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    // member stats track id but every dir SPANS the id range (interleaved
    // residues) — min/max can't prune a point, only the blooms can
    val pvt = new PartitionedVersionedTable(spark, root, "repo",
      memberStatsCols = Seq("id"), memberBloomCols = Seq("id"))
    (0 to 3).foreach { k =>
      val rows = (100 to 160).collect {
        case i if i % 4 == k => (i.toLong, "a", s"p$i", 10L)
      }
      if (k == 0) pvt.overwrite(df(rows: _*)) else pvt.append(df(rows: _*))
    }
    // narrow merge touches only the residue-0 dir (keys 100, 104)
    pvt.merge(df((100L, "a", "upd100", 20L), (104L, "a", "upd104", 20L)),
      Seq("id"), "updated_at")
    val ma = pvt.partition("a")
    val nDirs = ma.manifestOf(ma.latestVersion.get).dataDirs.size
    // untouched member dirs kept their sidecars: a residue-1 probe prunes
    val cand = ma.pointCandidateDirs("id", 109L)
    assert(cand.size < nDirs,
      s"bloom sidecars must prune the point probe ($cand of $nDirs dirs)")
    assert(ma.readPoint("id", 109L).collect()
      .map(_.getAs[String]("payload")).toSeq == Seq("p109"))
    // the rewritten dir's fresh bloom finds the merged row
    assert(ma.readPoint("id", 100L).collect()
      .map(_.getAs[String]("payload")).toSeq == Seq("upd100"))
  }

  test("restoreSnapshot fails loudly when a recorded member dir is gone") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df((1L, "a", "a1", 10L), (2L, "b", "b1", 10L)))
    val snap = pvt.snapshots.max
    // externally nuke partition b's directory (a raw fs rm, not an API op)
    val bDir = new java.io.File(s"$root/repo=b")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(bDir)
    assert(pvt.partitions == Seq("a"))
    val e = intercept[IllegalArgumentException](pvt.restoreSnapshot(snap))
    assert(e.getMessage.contains("b"))
    // nothing was committed: partition a's log did not advance
    assert(pvt.partition("a").latestVersion.get == 0L)
  }

  test("shallowCloneTo refuses a destRoot holding a live FLAT table") {
    val root = Files.createTempDirectory("pvt").resolve("t").toString
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    pvt.overwrite(df((1L, "a", "a1", 10L)))
    // a flat table already lives at dest (has a _txlog, no partition dirs)
    val dest = Files.createTempDirectory("pvt").resolve("flat").toString
    val flat = new graft.sources.VersionedTable(spark, dest)
    flat.overwrite(Seq((9L, "x")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException](pvt.shallowCloneTo(dest))
    assert(e.getMessage.contains("flat"))
    // the flat table is untouched
    assert(flat.read().count() == 1L)
  }
}
