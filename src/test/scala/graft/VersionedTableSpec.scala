package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Transaction-log table contract: append/overwrite/merge versioning,
  * snapshot isolation (read-at-old-version returns the pre-merge snapshot),
  * deterministic merge tie-break, optimistic-concurrency conflict, vacuum.
  */
class VersionedTableSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("vt_spec").resolve("tbl").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "payload", "updated_at")
  }

  test("overwrite then append accumulate versions; read sees the union") {
    val vt = VersionedTable(spark, freshRoot())
    assert(vt.latestVersion.isEmpty)
    val v0 = vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    val v1 = vt.append(df((3L, "c", 11L)))
    assert(v0 == 0L && v1 == 1L)
    assert(vt.read().count() == 3)
    assert(vt.readVersion(0).count() == 2)
    assert(vt.history().map(_.operation) == Seq("append", "overwrite"))
  }

  test("merge keeps latest updated_at per id; old version is the pre-merge snapshot") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "old1", 10L), (2L, "old2", 10L), (3L, "keep", 99L)))
    val v1 = vt.merge(df((1L, "new1", 20L), (3L, "stale", 5L), (4L, "ins", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    val out = vt.read().orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq
    // id 1 updated (newer), id 3 NOT updated (older update loses), id 4 inserted
    assert(out == Seq((1L, "new1"), (2L, "old2"), (3L, "keep"), (4L, "ins")))
    // snapshot isolation: v0 readback unchanged after the merge commit
    val before = vt.readVersion(v0).orderBy("id").collect().map(_.getString(1)).toSeq
    assert(before == Seq("old1", "old2", "keep"))
    assert(v1 == 1L)
  }

  test("merge tie on orderCol: updates side wins deterministically") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "base", 10L)))
    vt.merge(df((1L, "update", 10L)), keyCols = Seq("id"), orderCol = "updated_at")
    assert(vt.read().select("payload").head().getString(0) == "update")
  }

  test("duplicate tied keys WITHIN the updates frame resolve deterministically") {
    // same key, same orderCol, different payloads: the value tie-break
    // (desc) must pick the same winner on every run/partitioning
    (1 to 3).foreach { _ =>
      val vt = VersionedTable(spark, freshRoot())
      vt.merge(df((1L, "alpha", 5L), (1L, "zeta", 5L)).repartition(4),
        keyCols = Seq("id"), orderCol = "updated_at")
      assert(vt.read().select("payload").head().getString(0) == "zeta")
    }
  }

  test("concurrent writer of the same version loses with ConcurrentWriteException") {
    val root = freshRoot()
    val vt1 = VersionedTable(spark, root)
    val vt2 = VersionedTable(spark, root)
    vt1.overwrite(df((1L, "a", 1L)))
    // both see latest = 0 and race for version 1; vt1 commits first
    vt1.append(df((2L, "b", 2L)))
    // vt2's view raced: simulate by committing against the stale parent —
    // its attempt at version 1 must fail the atomic create-if-absent
    intercept[VersionedTable.ConcurrentWriteException] {
      val m = classOf[VersionedTable].getDeclaredMethod("commit",
        classOf[VersionedTable.Manifest])
      m.setAccessible(true)
      try m.invoke(vt2, VersionedTable.Manifest(1L, "append", 0L, Seq.empty))
      catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
    }
  }

  test("vacuum drops pre-keep manifests and their unreferenced data dirs") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 1L)))
    vt.merge(df((1L, "b", 2L)), Seq("id"), "updated_at") // copy-on-write: v0 dir now dead
    vt.append(df((2L, "c", 3L)))
    vt.vacuum(keepVersions = 2)
    assert(vt.versions == Seq(1L, 2L))
    // latest still reads fine and has the merged + appended rows
    assert(vt.read().count() == 2)
    intercept[Exception] { vt.readVersion(0L).collect() }
  }

  test("racing writers with retry-on-conflict: all commits land, log stays consistent") {
    val root = freshRoot()
    VersionedTable(spark, root).overwrite(df((0L, "init", 0L)))
    val perWriter = 3
    val threads = (1 to 2).map { w =>
      new Thread(() => {
        val vt = VersionedTable(spark, root) // own handle, shared log
        (1 to perWriter).foreach { i =>
          var committed = false
          while (!committed) {
            try { vt.append(df((w * 100L + i, s"w$w-$i", i.toLong))); committed = true }
            catch { case _: VersionedTable.ConcurrentWriteException => () } // lost the race: retry
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val vt = VersionedTable(spark, root)
    // every append landed exactly once; versions are a contiguous range
    assert(vt.read().count() == 1 + 2 * perWriter)
    assert(vt.versions == (0L to 2L * perWriter))
    // every manifest parses and its data dirs resolve
    vt.versions.foreach(v => vt.readVersion(v).count())
  }

  test("changesByKey classifies insert/delete/update pairs; null field transitions count") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(Seq(
      (1L, Option("a"), 10L), (2L, Option("b"), 10L),
      (3L, None: Option[String], 10L), (4L, Option("d"), 10L))
      .toDF("id", "payload", "updated_at"))
    // 1 updated, 2 deleted, 3 null→value update, 4 unchanged, 5 inserted
    val v1 = vt.merge(Seq(
      (1L, Option("a2"), 20L), (3L, Option("c"), 20L), (5L, Option("e"), 20L))
      .toDF("id", "payload", "updated_at"),
      keyCols = Seq("id"), orderCol = "updated_at",
      deleteWhen = Some(col("id") === 2L))
    vt.delete(col("id") === 2L) // actual delete of id 2 (merge didn't match it)
    val ch = vt.changesByKey(v0, vt.latestVersion.get, Seq("id")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(3))).toSet
    assert(ch == Set(
      (5L, Some("e"), "insert"),
      (2L, Some("b"), "delete"),
      (1L, Some("a"), "update_preimage"), (1L, Some("a2"), "update_postimage"),
      (3L, None, "update_preimage"), (3L, Some("c"), "update_postimage")))
    assert(v1 == v0 + 1)
  }

  test("changes() emits insert/delete rows between snapshots (update = pair)") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    val v1 = vt.merge(df((2L, "b2", 20L), (3L, "c", 20L)), Seq("id"), "updated_at")
    val ch = vt.changes(v0, v1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(ch == Set(
      (2L, "b2", "insert"), (3L, "c", "insert"), // update surfaces as pair
      (2L, "b", "delete")))
  }

  test("manifest stats skip non-overlapping dirs; pruned read returns exact rows") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root, statsCols = Seq("updated_at"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 19L)))   // dir range [10, 19]
    vt.append(df((3L, "c", 20L), (4L, "d", 29L)))      // dir range [20, 29]
    vt.append(df((5L, "e", 30L), (6L, "f", 39L)))      // dir range [30, 39]
    val v = vt.latestVersion.get
    // a [22, 25] window overlaps exactly one of three dirs
    assert(vt.candidateDirs(v, "updated_at", 22L, 25L).size == 1)
    assert(vt.candidateDirs(v, "updated_at", 0L, 100L).size == 3)
    assert(vt.candidateDirs(v, "updated_at", 15L, 21L).size == 2)
    // stats prune dirs, the exact predicate decides rows
    val out = vt.readRange("updated_at", 22L, 31L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(4L, 5L))
    // untracked column: nothing prunes, everything still correct
    assert(vt.candidateDirs(v, "payload", "a", "b").size == 3)
    // empty overlap: zero rows, schema intact
    assert(vt.readRange("updated_at", 500L, 600L).isEmpty)
  }

  test("zero-row append dirs carry the marker and never stay candidates") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("ts"))
    vt.overwrite(Seq((1L, 10L)).toDF("id", "ts"))
    vt.append(Seq((1L, 10L)).toDF("id", "ts").filter(col("ts") > 100))  // empty
    vt.append(Seq((2L, 20L)).toDF("id", "ts"))
    val v = vt.latestVersion.get
    // without the marker the statless empty dir would match every range
    assert(vt.candidateDirs(v, "ts", 0L, 100L).size == 2)
    assert(vt.readRange("ts", 0L, 100L).count() == 2)
  }

  test("stats stay exact at epoch-nano magnitudes (no double roundtrip)") {
    import spark.implicits._
    val base = 1700000000000000000L // ULP of a double here is 256
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("ts"))
    vt.overwrite(Seq((1L, base), (2L, base + 100)).toDF("id", "ts"))
    vt.append(Seq((3L, base + 200), (4L, base + 300)).toDF("id", "ts"))
    val v = vt.latestVersion.get
    // a window strictly between the dirs: double math couldn't see the gap
    assert(vt.candidateDirs(v, "ts", base + 101, base + 199).isEmpty)
    assert(vt.candidateDirs(v, "ts", base + 100, base + 100).size == 1)
    val out = vt.readRange("ts", base + 100, base + 200)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L)) // boundary rows exact, both sides
  }

  test("compact() folds many append deltas into one dir without changing contents") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 1L)))
    vt.append(df((2L, "b", 2L)))
    vt.append(df((3L, "c", 3L)))
    val before = vt.read().orderBy("id").collect().toSeq
    val v = vt.compact()
    assert(vt.history().head.operation == "compact")
    assert(vt.history().head.dataDirs.size == 1) // 3 dirs -> 1
    assert(vt.read().orderBy("id").collect().toSeq == before)
    assert(vt.readVersion(v - 1).count() == 3)   // history intact pre-vacuum
  }

  test("z-order compaction makes BOTH cluster columns prunable") {
    import spark.implicits._
    // x uniform, y = decorrelated scramble: appended in id order, every
    // dir spans the full range of both columns → nothing prunes
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x", "y"))
    val rows = (0L until 4096L).map(id => (id, id % 64, (id * 37) % 64))
    rows.grouped(1024).foreach { g =>
      if (vt.latestVersion.isEmpty) vt.overwrite(g.toDF("id", "x", "y"))
      else vt.append(g.toDF("id", "x", "y"))
    }
    val v0 = vt.latestVersion.get
    assert(vt.candidateDirs(v0, "x", 10L, 13L).size == 4)  // no pruning
    assert(vt.candidateDirs(v0, "y", 10L, 13L).size == 4)
    val v = vt.compactClustered(Seq("x", "y"), nChunks = 16)
    assert(vt.versions.contains(v) && vt.history().head.operation == "compact_clustered")
    // 16 chunks over the 16×16 curve = 4×4 spatial blocks: a narrow range
    // on EITHER column intersects ~1/4 of the dirs (linear sort would
    // leave the trailing column at 16/16)
    val px = vt.candidateDirs(v, "x", 10L, 13L).size
    val py = vt.candidateDirs(v, "y", 10L, 13L).size
    assert(px <= 8, s"x-range should prune most chunk dirs, kept $px/16")
    assert(py <= 8, s"y-range should prune most chunk dirs, kept $py/16")
    // contents are exactly the pre-compaction snapshot
    assert(vt.read().exceptAll(vt.readVersion(v0)).isEmpty &&
      vt.readVersion(v0).exceptAll(vt.read()).isEmpty)
    // pruned range-read returns exactly the filtered rows
    val got = vt.readRange("y", 10L, 13L).select("id").collect()
      .map(_.getLong(0)).toSet
    val want = rows.filter(r => r._3 >= 10 && r._3 <= 13).map(_._1).toSet
    assert(got == want)
  }

  test("type widening under mergeSchema: int columns widen to long, old dirs still read") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x")) // int, float
    // long + double incoming: widens under mergeSchema…
    intercept[graft.sources.VersionedTable.SchemaMismatchException] {
      vt.append(Seq((3L, 3.5d)).toDF("k", "x")) // …but rejects without it
    }
    vt.append(Seq((3L, 3.5d)).toDF("k", "x"), mergeSchema = true)
    import org.apache.spark.sql.types._
    assert(vt.tableSchema.get("k").dataType == LongType)
    assert(vt.tableSchema.get("x").dataType == DoubleType)
    // the pre-widening dir's int32/float physical files read under the
    // widened schema (Spark 4 parquet widening), values intact
    val out = vt.read().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    // a narrower LATER append also lands (casts up into the wide schema)
    vt.append(Seq((4, 4.5f)).toDF("k", "x"), mergeSchema = true)
    assert(vt.tableSchema.get("k").dataType == LongType)
    assert(vt.read().count() == 4)
    // non-widening conflicts still reject even with mergeSchema
    intercept[graft.sources.VersionedTable.SchemaMismatchException] {
      vt.append(Seq(("s", 1.0d)).toDF("k", "x"), mergeSchema = true)
    }
  }

  test("appendRetrying survives real concurrent writers; every append lands") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = freshRoot()
    VersionedTable(spark, root).overwrite(Seq((0L, "seed")).toDF("id", "s"))
    val futures = (1 to 6).map { i =>
      Future {
        // each writer gets its OWN handle (own cache) — the real topology
        VersionedTable(spark, root)
          .appendRetrying(Seq((i.toLong, s"w$i")).toDF("id", "s"),
            maxAttempts = 20)
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    val vt = VersionedTable(spark, root)
    assert(vt.latestVersion.contains(6L)) // exactly one version per append
    assert(vt.read().count() == 7L)
    assert(vt.read().select("id").collect().map(_.getLong(0)).toSet ==
      (0L to 6L).toSet)
    assert(vt.metadataCount().contains(7L)) // ledger survived the races
  }

  test("metadataCount answers count(*) from the manifest across every write path") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "ts"))
    assert(vt.metadataCount().contains(2L))
    vt.append(Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "ts"))
    assert(vt.metadataCount().contains(4L))
    // merge: 1 update (id=2) + 1 insert (id=5) → 5 logical rows
    val vMerge = vt.merge(Seq((2L, "B", 21L), (5L, "e", 50L)).toDF("id", "s", "ts"),
      keyCols = Seq("id"), orderCol = "ts")
    assert(vt.metadataCount().contains(5L))
    vt.update(col("id") === 3L, Map("s" -> lit("C")))
    assert(vt.metadataCount().contains(5L))
    vt.delete(col("id") === 1L)
    assert(vt.metadataCount().contains(4L))
    vt.compactClustered(Seq("id", "ts"), nChunks = 2)
    assert(vt.metadataCount().contains(4L))
    vt.compact()
    assert(vt.metadataCount().contains(4L))
    // ledger equals the physical truth after the whole history
    assert(vt.metadataCount().contains(vt.read().count()))
    // a fresh handle reads the ledger from the persisted manifest
    assert(VersionedTable(spark, vt.root).metadataCount().contains(4L))
    // restore carries the restored version's ledger (5-row post-merge state)
    vt.restore(vMerge)
    assert(vt.metadataCount().contains(5L))
  }

  test("metadataCount declines when deletion vectors make physical ≠ logical") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    vt.delete(col("id") === 2L, useDeletionVectors = true)
    assert(vt.metadataCount().isEmpty) // DV'd snapshot: must not claim exactness
    assert(vt.read().count() == 2L)
    vt.compact() // materializes the DV away → ledger is exact again
    assert(vt.metadataCount().contains(2L))
  }

  test("readWhere prunes dirs from predicate bounds and never changes results") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    // four non-overlapping x-ranges, one dir each → ranges prune cleanly
    (0 until 4).foreach { k =>
      val rows = (k * 25 until (k + 1) * 25).map(i => (i.toLong, i.toLong, s"s$i"))
      if (vt.latestVersion.isEmpty) vt.overwrite(rows.toDF("id", "x", "s"))
      else vt.append(rows.toDF("id", "x", "s"))
    }
    val v = vt.latestVersion.get
    // two-sided band on the tracked column keeps exactly one dir
    val band = col("x") >= 30L && col("x") <= 45L
    assert(vt.skipDirsFor(v, band).size == 1)
    assert(vt.readWhere(band).count() == 16)
    // strict bounds are inclusivity-aware: x > 49 prunes the dir whose max
    // IS 49 (no row can exceed its own max), where a closed relaxation
    // would have to keep it
    assert(vt.skipDirsFor(v, col("x") > 49L).size == 2)
    assert(vt.readWhere(col("x") > 49L).count() == 50)
    // the literal-on-the-left strict form prunes identically: 50 > x
    assert(vt.skipDirsFor(v, lit(50L) > col("x")).size == 2)
    assert(vt.readWhere(lit(50L) > col("x")).count() == 50)
    // literal-on-the-left and equality both bound
    assert(vt.skipDirsFor(v, lit(10L) >= col("x")).size == 1)
    assert(vt.skipDirsFor(v, col("x") === 77L).size == 1)
    // a cast string literal folds into the stat domain
    assert(vt.skipDirsFor(v, col("x") <= lit("10").cast("long")).size == 1)
    // OR / untracked-column subtrees contribute no bounds — no pruning,
    // same rows as a plain filter
    val mixed = (col("x") >= 30L && col("x") <= 45L) &&
      (col("s") === "s31" || col("id") > 40L)
    assert(vt.skipDirsFor(v, mixed).size == 1) // AND side still prunes
    assert(vt.readWhere(mixed).select("id").collect().map(_.getLong(0)).toSet ==
      vt.read().filter(mixed).select("id").collect().map(_.getLong(0)).toSet)
    // a type-mismatched probe must not throw and must not wrongly prune
    assert(vt.readWhere(col("x") === "not-a-number").count() == 0)
    // IN-list prunes by its [min, max] envelope
    assert(vt.skipDirsFor(v, col("x").isin(30L, 41L, 44L)).size == 1)
    assert(vt.readWhere(col("x").isin(30L, 41L, 44L)).count() == 3)
    // small IN-lists expand per-value: dirs BETWEEN the values drop where
    // the [min, max] envelope would keep the whole span
    assert(vt.skipDirsFor(v, col("x").isin(10L, 60L)).size == 2)
    assert(vt.readWhere(col("x").isin(10L, 60L)).count() == 2)
    // NOT IN prunes nothing here (no constant dir) but stays correct
    assert(vt.readWhere(!col("x").isin(10L, 60L)).count() == 98)
    // OR unions its disjuncts' candidate sets: the two middle dirs drop
    // where a conjunctive-only extractor would keep everything
    val tails = col("x") < 10L || col("x") > 90L
    assert(vt.skipDirsFor(v, tails).size == 2)
    assert(vt.readWhere(tails).count() == 19)
    // OR with an unprunable disjunct degrades to all dirs, stays correct
    val loose = col("x") < 10L || col("s") === "s77"
    assert(vt.skipDirsFor(v, loose).size == 4)
    assert(vt.readWhere(loose).count() == 11)
    // AND of ORs: each conjunct's union intersects
    val cross = (col("x") < 10L || col("x") > 90L) && col("x") >= 50L
    assert(vt.skipDirsFor(v, cross).size == 1)
    assert(vt.readWhere(cross).count() == 9)
    // NOT pushes to the leaves: !(x > 49) complements to x <= 49
    assert(vt.skipDirsFor(v, !(col("x") > 49L)).size == 2)
    assert(vt.readWhere(!(col("x") > 49L)).count() == 50)
    // De Morgan: !(x < 25 || x > 74) → x >= 25 && x <= 74 (middle dirs)
    val notTails = !(col("x") < 25L || col("x") > 74L)
    assert(vt.skipDirsFor(v, notTails).size == 2)
    assert(vt.readWhere(notTails).count() == 50)
    // double negation elides
    assert(vt.skipDirsFor(v, !(!(col("x") <= 10L))).size == 1)
  }

  test("year() predicates invert to range bounds on timestamp and date columns") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("ts", "d"))
    (1995 to 1998).foreach { y =>
      val df = Seq((s"$y-03-15 10:00:00", s"$y-03-15"),
        (s"$y-09-01 00:00:00", s"$y-09-01")).toDF("tss", "ds")
        .select(col("tss").cast("timestamp").as("ts"),
          col("ds").cast("date").as("d"))
      if (vt.latestVersion.isEmpty) vt.overwrite(df) else vt.append(df)
    }
    val v = vt.latestVersion.get
    // equality, range, and literal-on-the-left all invert on timestamps
    assert(vt.skipDirsFor(v, year(col("ts")) === 1996).size == 1)
    assert(vt.readWhere(year(col("ts")) === 1996).count() == 2)
    assert(vt.skipDirsFor(v, year(col("ts")) >= 1997).size == 2)
    assert(vt.skipDirsFor(v, year(col("ts")) < 1996).size == 1)
    assert(vt.skipDirsFor(v, lit(1995) >= year(col("ts"))).size == 1)
    // date columns invert in the string stat domain (ISO order)
    assert(vt.skipDirsFor(v, year(col("d")) === 1998).size == 1)
    assert(vt.readWhere(year(col("d")) === 1998).count() == 2)
    // an uninvertible wrap (month) prunes nothing and stays correct
    assert(vt.skipDirsFor(v, month(col("ts")) === 3).size == 4)
    assert(vt.readWhere(month(col("ts")) === 3).count() == 4)
    // CAST(ts AS DATE) = date-literal inverts to the UTC-midnight band
    val day = col("ts").cast("date") === lit("1996-03-15").cast("date")
    assert(vt.skipDirsFor(v, day).size == 1)
    assert(vt.readWhere(day).count() == 1)
    assert(vt.skipDirsFor(v,
      col("ts").cast("date") >= lit("1997-01-01").cast("date")).size == 2)
    assert(vt.readWhere(
      col("ts").cast("date") >= lit("1997-01-01").cast("date")).count() == 4)
    // date_trunc inverts too: aligned month equality, and an UNALIGNED
    // inequality still bounds via the nearest boundary
    val mon = date_trunc("month", col("ts")) ===
      lit("1996-03-01 00:00:00").cast("timestamp")
    assert(vt.skipDirsFor(v, mon).size == 1)
    assert(vt.readWhere(mon).count() == 1)
    val late = date_trunc("year", col("ts")) >=
      lit("1996-07-04 12:00:00").cast("timestamp") // unaligned → years >= 1997
    assert(vt.skipDirsFor(v, late).size == 2)
    assert(vt.readWhere(late).count() == 4)
    // unaligned equality is never TRUE; prunes nothing, returns nothing
    val bad = date_trunc("month", col("ts")) ===
      lit("1996-03-02 00:00:00").cast("timestamp")
    assert(vt.skipDirsFor(v, bad).size == 4)
    assert(vt.readWhere(bad).count() == 0)
  }

  test("NOT-equality pruning drops constant dirs; nulls never wrongly pruned") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    // dir of only x=5 (min = max = 5), a mixed dir, and a 5-or-null dir
    vt.overwrite(Seq((1L, 5L), (2L, 5L)).toDF("id", "x"))
    vt.append(Seq((3L, 7L), (4L, 9L)).toDF("id", "x"))
    vt.append(Seq[(Long, Option[Long])]((5L, Some(5L)), (6L, None))
      .toDF("id", "x"))
    val v = vt.latestVersion.get
    // x <> 5 is TRUE only off the constant: the min=max=5 dirs drop even
    // when they also hold nulls (null <> 5 is NULL, not TRUE)
    assert(vt.skipDirsFor(v, col("x") =!= 5L).size == 1)
    assert(vt.readWhere(col("x") =!= 5L).select("id").collect()
      .map(_.getLong(0)).toSet == Set(3L, 4L))
    // NOT over a null test routes through the ledger: !(isNotNull) = isNull
    // keeps only the one dir that actually holds a null
    assert(vt.skipDirsFor(v, !col("x").isNotNull).size == 1)
    assert(vt.readWhere(!col("x").isNotNull).count() == 1)
    // NOT IN expands to a conjunction of <> leaves: both min=max=5 dirs drop
    assert(vt.skipDirsFor(v, !col("x").isin(5L, 99L)).size == 1)
    assert(vt.readWhere(!col("x").isin(5L, 99L)).select("id").collect()
      .map(_.getLong(0)).toSet == Set(3L, 4L))
  }

  test("readWhere prunes string prefixes in code-point order") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("s"))
    vt.overwrite(Seq((1L, "apple"), (2L, "apricot")).toDF("id", "s"))
    vt.append(Seq((3L, "banana"), (4L, "blueberry")).toDF("id", "s"))
    vt.append(Seq((5L, "cherry"), (6L, "citrus")).toDF("id", "s"))
    val v = vt.latestVersion.get
    assert(vt.skipDirsFor(v, col("s").startsWith("b")).size == 1)
    assert(vt.readWhere(col("s").startsWith("b")).count() == 2)
    assert(vt.skipDirsFor(v, col("s").startsWith("ap")).size == 1)
    // prefix straddling dirs stays correct (no wrongful prune)
    assert(vt.readWhere(col("s").startsWith("c")).count() == 2)
    // non-ASCII prefix: the code-point increment keeps the bound valid
    vt.append(Seq((7L, "émile"), (8L, "éclair")).toDF("id", "s"))
    assert(vt.readWhere(col("s").startsWith("é")).count() == 2)
    assert(vt.skipDirsFor(vt.latestVersion.get, col("s").startsWith("é")).size == 1)
  }

  test("null ledger: IS NULL / IS NOT NULL pruning and metadata null counts") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite(Seq[(Long, Option[Long])]((1L, Some(10L)), (2L, Some(20L)))
      .toDF("id", "x")) // no nulls
    vt.append(Seq[(Long, Option[Long])]((3L, Some(30L)), (4L, None))
      .toDF("id", "x")) // mixed
    vt.append(Seq[(Long, Option[Long])]((5L, None), (6L, None))
      .toDF("id", "x")) // all null
    val v = vt.latestVersion.get
    // IS NULL skips the zero-null dir
    assert(vt.skipDirsFor(v, col("x").isNull).size == 2)
    assert(vt.readWhere(col("x").isNull).count() == 3)
    // IS NOT NULL skips the all-null dir — exactly where min/max stats are
    // blind (no non-null value → no stats entry)
    assert(vt.skipDirsFor(v, col("x").isNotNull).size == 2)
    assert(vt.readWhere(col("x").isNotNull).count() == 3)
    // AND with an untracked-column leaf still prunes on the null test
    assert(vt.skipDirsFor(v, col("x").isNull && col("id") > 0L).size == 2)
    // untracked column / cast-wrapped column: fail open, never prune
    assert(vt.skipDirsFor(v, col("id").isNull).size == 3)
    assert(vt.skipDirsFor(v, col("x").cast("string").isNull).size == 3)
    // metadata-only null count, persisted: a fresh handle reads the ledger
    assert(vt.metadataNullCount("x").contains(3L))
    assert(VersionedTable(spark, vt.root, Seq("x"))
      .metadataNullCount("x").contains(3L))
    assert(vt.metadataNullCount("id").isEmpty) // untracked
    // the all-null dir no longer blocks a metadata-exact min/max
    assert(vt.metadataMinMax("x").contains(("10", "30")))
    // copy-on-write delete recomputes the rewritten dir's null counts
    vt.delete(col("id") === 4L)
    assert(vt.metadataNullCount("x").contains(2L))
    // a DV'd snapshot must decline — a deleted row may have been a null
    vt.delete(col("id") === 5L, useDeletionVectors = true)
    assert(vt.metadataNullCount("x").isEmpty)
    vt.compact() // materializes the DV → exact again
    assert(vt.metadataNullCount("x").contains(1L))
  }

  test("merge WHEN NOT MATCHED BY SOURCE deletes scoped unmatched rows; out-of-scope dirs carry") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite(Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "x", "s"))
    vt.append(Seq((3L, 100L, "c"), (4L, 200L, "d")).toDF("id", "x", "s"))
    val m0 = vt.manifestOf(vt.latestVersion.get)
    val dirB = m0.dataDirs.last
    // id 2 updates; the sync arm is SCOPED to x < 50 — id 1 (unmatched,
    // in scope) deletes, ids 3/4 are out of scope and their dir must
    // carry by path (the cond stats-prunes the extra discovery)
    vt.merge(Seq((2L, 21L, "b2")).toDF("id", "x", "s"),
      keyCols = Seq("id"), orderCol = "x",
      deleteNotMatchedBySource = Some(col("x") < 50L))
    val m1 = vt.manifestOf(vt.latestVersion.get)
    assert(m1.dataDirs.contains(dirB))
    assert(m1.stats(dirB) == m0.stats(dirB))
    val state = vt.read().collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(state == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
    // without the arm, unmatched rows survive as before (regression guard)
    vt.merge(Seq((5L, 30L, "e")).toDF("id", "x", "s"),
      keyCols = Seq("id"), orderCol = "x")
    assert(vt.read().count() == 4)
  }

  test("merge never collapses distinct null-keyed rows (they bypass the winner window)") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq[(Option[Long], Long, String)](
      (Some(1L), 10L, "a"), (None, 20L, "x1"), (None, 30L, "x2"))
      .toDF("id", "x", "s"))
    // the matched key pulls the dir into the rewrite; BOTH null-keyed
    // rows must survive it (Window.partitionBy groups nulls — bypassed)
    vt.merge(Seq[(Option[Long], Long, String)]((Some(1L), 11L, "a2"))
      .toDF("id", "x", "s"), keyCols = Seq("id"), orderCol = "x")
    assert(vt.read().count() == 3)
    assert(vt.read().filter(col("id").isNull).count() == 2)
    // null-keyed UPDATE rows never match → they all insert, none collapse
    vt.merge(Seq[(Option[Long], Long, String)]((None, 40L, "y1"), (None, 50L, "y2"))
      .toDF("id", "x", "s"), keyCols = Seq("id"), orderCol = "x")
    assert(vt.read().count() == 5)
    // the sync arm deletes a null-keyed row exactly when its cond is true
    vt.merge(Seq[(Option[Long], Long, String)]((Some(1L), 12L, "a3"))
      .toDF("id", "x", "s"), keyCols = Seq("id"), orderCol = "x",
      deleteNotMatchedBySource = Some(col("s") === "x1"))
    assert(vt.read().filter(col("s") === "x1").isEmpty)
    assert(vt.read().count() == 4)
  }

  test("vacuumOlderThan drops superseded-before-cutoff versions, never the latest") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1L, "a")).toDF("id", "v")) // v0
    Thread.sleep(5)
    vt.append(Seq((2L, "b")).toDF("id", "v")) // v1 (supersedes v0)
    Thread.sleep(5)
    vt.append(Seq((3L, "c")).toDF("id", "v")) // v2 (supersedes v1)
    val t2 = vt.manifestOf(2L).timestampMs
    // v0 was superseded before t2 → drops; v1 was superseded AT t2 → kept
    vt.vacuumOlderThan(t2)
    assert(vt.versions == Seq(1L, 2L))
    assert(vt.readVersion(1L).count() == 2) // time travel to kept version
    // far-future cutoff: every superseded version drops, latest survives —
    // even though its own timestamp is long before the cutoff
    vt.vacuumOlderThan(Long.MaxValue)
    assert(vt.versions == Seq(2L))
    assert(vt.read().count() == 3)
  }

  test("detail summarizes the live snapshot metadata-first") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"))
    vt.append(Seq((3L, 30L)).toDF("id", "x"))
    val d = vt.detail()
    assert(d.version == 1L && d.operation == "append")
    assert(d.numDataDirs == 2 && d.numRows.contains(3L) && d.liveDvs == 0)
    assert(d.sizeBytes > 0)
    assert(d.schema.exists(_.fieldNames.sameElements(Array("id", "x"))))
    // a live DV makes the row count decline, like metadataCount
    vt.delete(col("id") === 2L, useDeletionVectors = true)
    val d2 = vt.detail()
    assert(d2.numRows.isEmpty && d2.liveDvs == 1)
  }

  test("compactSmall packs only sub-threshold dirs; big dirs and DVs carry") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite((0L until 100L).map(i => (i, i)).toDF("id", "x")) // big
    vt.append(Seq((100L, 100L)).toDF("id", "x")) // small
    vt.append(Seq((101L, 101L)).toDF("id", "x")) // small
    vt.append(Seq((102L, 102L)).toDF("id", "x")) // small
    val m0 = vt.manifestOf(vt.latestVersion.get)
    val bigDir = m0.dataDirs.head
    // a DV'd delete in the BIG dir must survive the pack untouched
    vt.delete(col("id") === 7L, useDeletionVectors = true)
    val v = vt.compactSmall(minRows = 50)
    assert(v.isDefined)
    val m1 = vt.manifestOf(v.get)
    // 3 small dirs folded into 1; the big dir carries by PATH with stats
    assert(m1.dataDirs.size == 2)
    assert(m1.dataDirs.contains(bigDir))
    assert(m1.stats(bigDir) == m0.stats(bigDir))
    assert(m1.dirRows(bigDir) == 100L)
    // contents identical: DV'd row still out, small rows all present
    assert(vt.read().count() == 102L)
    assert(vt.read().filter(col("id") === 7L).isEmpty)
    assert(vt.read().filter(col("id") >= 100L).count() == 3L)
    // the consolidated dir has fresh stats: a range read over the small
    // band opens ONE dir
    assert(vt.candidateDirs(v.get, "x", 100L, 102L).size == 1)
    // nothing to pack → None, no new version
    assert(vt.compactSmall(minRows = 50).isEmpty)
  }

  test("merge clusters its rewritten dir by the tracked column (file-level sort)") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    // rows arrive shuffled; the merge rewrite should land x-sorted per file
    val rows = scala.util.Random.shuffle((0L until 2000L).toList)
      .map(i => (i, i, s"v$i"))
    vt.overwrite(rows.toDF("id", "x", "s"))
    vt.merge(Seq((5L, 5L, "updated")).toDF("id", "x", "s"),
      keyCols = Seq("id"), orderCol = "x")
    val m = vt.manifestOf(vt.latestVersion.get)
    val newDir = m.dataDirs.last
    val files = spark.read
      .parquet(new org.apache.hadoop.fs.Path(vt.root, newDir).toString)
      .select(col("x"), col("_metadata.file_path").as("f"))
      .collect().groupBy(_.getString(1))
    // within every written file, x is non-decreasing in row order
    files.foreach { case (f, rs) =>
      val xs = rs.map(_.getLong(0)).toSeq
      assert(xs == xs.sorted, s"file $f not clustered on x")
    }
  }

  test("metadataMinMax folds dir stats; declines under DVs and for untracked columns") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite(Seq((1L, 5L), (2L, 9L)).toDF("id", "x"))
    vt.append(Seq((3L, 1L), (4L, 7L)).toDF("id", "x"))
    assert(vt.metadataMinMax("x").contains(("1", "9")))
    assert(vt.metadataMinMax("id").isEmpty) // untracked column
    // copy-on-write delete recomputes the rewritten dir's stats: the old
    // min (x=1) leaves WITH its row
    vt.delete(col("x") === 1L)
    assert(vt.metadataMinMax("x").contains(("5", "9")))
    // a DV'd snapshot must decline — the deleted row may have been the max
    vt.delete(col("x") === 9L, useDeletionVectors = true)
    assert(vt.metadataMinMax("x").isEmpty)
    vt.compact() // materializes the DV → exact again
    assert(vt.metadataMinMax("x").contains(("5", "7")))
  }

  test("multi-column range read intersects candidate sets and beats either column alone") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x", "y"))
    val rows = (0L until 4096L).map(id => (id, id % 64, (id * 37) % 64))
    rows.grouped(1024).foreach { g =>
      if (vt.latestVersion.isEmpty) vt.overwrite(g.toDF("id", "x", "y"))
      else vt.append(g.toDF("id", "x", "y"))
    }
    val v = vt.compactClustered(Seq("x", "y"), nChunks = 16)
    val px = vt.candidateDirs(v, "x", 10L, 13L).toSet
    val py = vt.candidateDirs(v, "y", 10L, 13L).toSet
    val both = px intersect py
    // the curve makes each column prune to ~1/4 of the chunks; the
    // conjunction intersects to ~1/16 — strictly better than either alone
    assert(both.size < math.min(px.size, py.size),
      s"|x|=${px.size} |y|=${py.size} |both|=${both.size}")
    val got = vt.readRangeMulti(Seq(("x", 10L, 13L), ("y", 10L, 13L)))
      .select("id").collect().map(_.getLong(0)).toSet
    val want = rows.filter(r => r._2 >= 10 && r._2 <= 13 &&
      r._3 >= 10 && r._3 <= 13).map(_._1).toSet
    assert(got == want) // pruning is lossless under the conjunction
    // an impossible conjunction (disjoint per-column candidates) is empty
    assert(vt.readRangeMulti(Seq(("x", 10L, 10L), ("x", 50L, 50L))).isEmpty)
  }

  test("z-order clusters STRING columns via UTF8-prefix bins; string ranges prune") {
    import spark.implicits._
    // s = zero-padded decorrelated scramble of id: appended in id order,
    // every dir spans the full string range → nothing prunes pre-cluster
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x", "s"))
    val rows = (0L until 4096L).map(id => (id, id % 64, f"${(id * 37) % 64}%02d"))
    rows.grouped(1024).foreach { g =>
      if (vt.latestVersion.isEmpty) vt.overwrite(g.toDF("id", "x", "s"))
      else vt.append(g.toDF("id", "x", "s"))
    }
    val v0 = vt.latestVersion.get
    assert(vt.candidateDirs(v0, "s", "10", "13").size == 4) // no pruning yet
    val v = vt.compactClustered(Seq("x", "s"), nChunks = 16)
    val ps = vt.candidateDirs(v, "s", "10", "13").size
    val px = vt.candidateDirs(v, "x", 10L, 13L).size
    assert(ps <= 8, s"string-range should prune most chunk dirs, kept $ps/16")
    assert(px <= 8, s"numeric co-column should stay prunable, kept $px/16")
    // pruned string-range read returns exactly the filtered rows
    val got = vt.readRange("s", "10", "13").select("id").collect()
      .map(_.getLong(0)).toSet
    val want = rows.filter(r => r._3 >= "10" && r._3 <= "13").map(_._1).toSet
    assert(got == want)
  }

  test("delete and vacuum work on a clustered table (chunk subdir grain)") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x"))
    vt.overwrite((0L until 1024L).map(id => (id, id % 32)).toDF("id", "x"))
    vt.compactClustered(Seq("id", "x"), nChunks = 8)
    val before = vt.manifestOf(vt.latestVersion.get)
    val v = vt.delete(col("id") < 64L)
    assert(vt.read().count() == 960)
    assert(vt.read().agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) == 64L)
    // dir-grained: chunks without matching ids carry over untouched
    val after = vt.manifestOf(v)
    assert(after.dataDirs.toSet.intersect(before.dataDirs.toSet).nonEmpty,
      "expected untouched chunk subdirs to carry into the post-delete version")
    // vacuum to latest: the clustered parent dir must survive (its chunk
    // subdirs are live), dropped subdirs go
    vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(vt.read().count() == 960)
  }

  test("crashed-writer debris never reaches readers; vacuum sweeps it") {
    // simulate a writer that died at every interruptible point of the
    // commit protocol: after writing its manifest tmp (half-written JSON),
    // after writing a checkpoint tmp, and after writing data files but
    // BEFORE the manifest rename (an orphan data dir). None of it is
    // referenced by any committed manifest, so readers must be blind to
    // all of it, the ledger must keep extending past it, and vacuum must
    // sweep it once the in-flight window passes.
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 11L)))
    val p = java.nio.file.Paths.get(root)
    val log = p.resolve("_txlog")
    Files.write(log.resolve(".tmp-99-deadbeef"),
      """{"version": 99, "dataDirs": ["data/never""".getBytes) // torn JSON
    Files.write(log.resolve("._cptmp-junk"), "not json".getBytes)
    val orphan = p.resolve("data").resolve("orphan-crashed-writer")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-00000.parquet"), "junk".getBytes)
    // a bucketed writer that died between saveAsTable and the rename
    val staged = p.resolve("_staging").resolve("bkt-deadbeef")
    Files.createDirectories(staged)
    Files.write(staged.resolve("part-00000_00001.parquet"), "junk".getBytes)
    // readers and the version ledger are unaffected
    assert(vt.read().count() == 3)
    assert(vt.latestVersion.contains(1L))
    assert(vt.history().map(_.version) == Seq(1L, 0L))
    assert(vt.readVersion(0).count() == 2)
    // the next commit extends the ledger straight past the debris
    val v2 = vt.append(df((4L, "d", 12L)))
    assert(v2 == 2L && vt.read().count() == 4)
    // a FRESH handle (no warm caches) sees the same world
    val vt2 = VersionedTable(spark, root)
    assert(vt2.read().count() == 4 && vt2.latestVersion.contains(2L))
    // inside the in-flight window nothing is touched (a live writer's
    // tmp file looks exactly like debris)
    vt.vacuum(keepVersions = 10, orphanRetentionMs = 60 * 60 * 1000L)
    assert(Files.exists(log.resolve(".tmp-99-deadbeef")))
    assert(Files.exists(orphan))
    assert(Files.exists(staged))
    // past the window the sweep takes debris, keeps every live artifact
    vt.vacuum(keepVersions = 10, orphanRetentionMs = 0L)
    assert(!Files.exists(log.resolve(".tmp-99-deadbeef")))
    assert(!Files.exists(log.resolve("._cptmp-junk")))
    assert(!Files.exists(orphan))
    assert(!Files.exists(staged))
    assert(vt.read().count() == 4)
    assert(vt.readVersion(0).count() == 2, "live versions survive the sweep")
  }

  test("readAsOf returns the newest version at or before the timestamp") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 1L)))
    val t0 = vt.history().head.timestampMs
    vt.append(df((2L, "b", 2L)))
    assert(vt.readAsOf(t0).count() == 1)
    assert(vt.readAsOf(System.currentTimeMillis() + 1000).count() == 2)
  }

  // ----------------------------------------------- schema enforcement

  test("append rejects schema drift and type conflicts at commit time") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 1L)))
    // extra column without mergeSchema
    intercept[VersionedTable.SchemaMismatchException] {
      vt.append(Seq((2L, "b", 2L, "new")).toDF("id", "payload", "updated_at", "extra"))
    }
    // missing column without mergeSchema
    intercept[VersionedTable.SchemaMismatchException] {
      vt.append(Seq((2L, "b")).toDF("id", "payload"))
    }
    // type conflict rejects even WITH mergeSchema
    intercept[VersionedTable.SchemaMismatchException] {
      vt.append(Seq((2L, "b", "not-a-long")).toDF("id", "payload", "updated_at"),
        mergeSchema = true)
    }
    // a rejected commit must not have burned a version
    assert(vt.versions == Seq(0L))
    assert(vt.read().count() == 1)
  }

  test("mergeSchema append evolves additively; old dirs read the new column as null") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 1L)))
    vt.append(Seq((2L, "b", 2L, "tagged")).toDF("id", "payload", "updated_at", "tag"),
      mergeSchema = true)
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq((1L, None), (2L, Some("tagged"))))
    assert(vt.tableSchema.get.fieldNames.toSeq ==
      Seq("id", "payload", "updated_at", "tag"))
    // missing columns are allowed under evolution too (null-filled)
    vt.append(Seq((3L, 3L)).toDF("id", "updated_at"), mergeSchema = true)
    val r3 = vt.read().filter(col("id") === 3L).head()
    assert(r3.isNullAt(1) && r3.isNullAt(3))
  }

  // ------------------------------------------------- row-level DELETE

  test("delete removes matching rows; pre-delete snapshot stays readable") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    val v1 = vt.delete(col("updated_at") >= 20L)
    assert(v1 == v0 + 1)
    assert(vt.read().collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(vt.readVersion(v0).count() == 3) // time travel pre-delete
    assert(vt.history().head.operation == "delete")
  }

  test("delete is dir-grained: untouched dirs carry into the new version as-is") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    vt.append(df((2L, "b", 20L)))
    vt.append(df((3L, "c", 30L)))
    val before = vt.history().head.dataDirs
    vt.delete(col("id") === 3L) // matches only the last dir
    val after = vt.history().head.dataDirs
    // the two untouched dirs are REUSED (same names), only the hit dir rewrote
    assert(after.take(2) == before.take(2))
    assert(!after.contains(before(2)))
    assert(vt.read().collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("delete with a null-evaluating predicate keeps the row (SQL DELETE semantics)") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1L, Some("x")), (2L, None: Option[String])).toDF("id", "payload"))
    vt.delete(col("payload") === "x") // null === "x" is null → row 2 kept
    assert(vt.read().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("no-op delete still commits a version with unchanged contents") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    val v = vt.delete(col("id") === 99L)
    assert(v == 1L && vt.read().count() == 1)
    assert(vt.history().head.operation == "delete")
  }

  test("merge deleteWhen removes matched keys, inserts the rest (WHEN MATCHED DELETE)") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)))
    // id 1: flagged delete (matched → removed); id 2: normal update;
    // id 4: flagged delete but NOT matched → no-op, not inserted
    vt.merge(df((1L, "del", 20L), (2L, "b2", 20L), (4L, "del", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at",
      deleteWhen = Some(col("payload") === "del"))
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((2L, "b2"), (3L, "c")))
  }

  test("merge is dir-grained: untouched dirs and their stats carry into the new version") {
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("updated_at"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 19L)))
    vt.append(df((3L, "c", 20L), (4L, "d", 29L)))
    vt.append(df((5L, "e", 30L), (6L, "f", 39L)))
    val before = vt.history().head
    // touches only id 5 (last dir); id 7 is a not-matched insert
    vt.merge(df((5L, "e2", 100L), (7L, "g", 100L)), Seq("id"), "updated_at")
    val after = vt.history().head
    // the two unmatched dirs are REUSED (same paths), only the hit dir rewrote
    assert(after.dataDirs.take(2) == before.dataDirs.take(2))
    assert(!after.dataDirs.contains(before.dataDirs(2)))
    assert(after.dataDirs.size == 3) // 2 carried + 1 new (winners + insert)
    before.dataDirs.take(2).foreach { d =>
      assert(after.stats.get(d) == before.stats.get(d),
        s"carried dir $d must keep its exact stats entry")
    }
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e2"), (6L, "f"), (7L, "g")))
  }

  test("merge with no matched keys carries ALL dirs and appends one insert dir") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    vt.append(df((2L, "b", 20L)))
    val before = vt.history().head.dataDirs
    vt.merge(df((9L, "ins", 99L)), Seq("id"), "updated_at")
    val after = vt.history().head.dataDirs
    assert(after.take(2) == before && after.size == 3)
    assert(vt.read().count() == 3)
  }

  test("merge discovery is stats-pruned when the key is a tracked column") {
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))  // id range [1, 2]
    vt.append(df((10L, "c", 10L), (11L, "d", 10L)))   // [10, 11]
    vt.append(df((20L, "e", 10L), (21L, "f", 10L)))   // [20, 21]
    val before = vt.history().head
    // update key 10 (middle dir), insert 100 (outside every dir range);
    // the [1,2] dir is outside the updates' [10,100] key span → never read
    vt.merge(df((10L, "c2", 99L), (100L, "ins", 99L)), Seq("id"), "updated_at")
    val after = vt.history().head
    assert(after.dataDirs.head == before.dataDirs.head)
    assert(after.dataDirs.contains(before.dataDirs(2))) // scanned, unmatched → kept
    assert(!after.dataDirs.contains(before.dataDirs(1)))
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (10L, "c2"), (11L, "d"),
      (20L, "e"), (21L, "f"), (100L, "ins")))
    // pure insert outside every range: zero dirs scanned or rewritten
    vt.merge(df((200L, "ins2", 99L)), Seq("id"), "updated_at")
    val after2 = vt.history().head
    assert(after.dataDirs.forall(after2.dataDirs.contains))
    assert(after2.dataDirs.size == after.dataDirs.size + 1)
    assert(vt.read().count() == 8)
  }

  test("narrow merge on a clustered table keeps untouched chunk subdirs (clustering survives)") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite((0L until 1024L).map(i => (i, i, s"p$i"))
      .toDF("id", "updated_at", "payload"))
    vt.compactClustered(Seq("id", "updated_at"), nChunks = 8)
    val before = vt.manifestOf(vt.latestVersion.get)
    vt.merge(Seq((3L, 9999L, "upd"), (5000L, 9999L, "ins"))
      .toDF("id", "updated_at", "payload"), Seq("id"), "updated_at")
    val after = vt.history().head
    val carried = after.dataDirs.toSet.intersect(before.dataDirs.toSet)
    assert(carried.size >= 6,
      s"expected most chunk subdirs untouched, carried ${carried.size}/8")
    assert(vt.read().count() == 1025)
    assert(vt.read().filter(col("id") === 3L)
      .select("payload").head.getString(0) == "upd")
    // skipping stats stay selective after the narrow merge
    val cand = vt.candidateDirs(after.version, "id", 100L, 120L)
    assert(cand.size < after.dataDirs.size,
      s"expected id-range pruning to survive the merge, kept ${cand.size}/${after.dataDirs.size}")
  }

  test("stale deleteWhen update loses to a newer base row (delete only if it wins)") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "base", 50L)))
    vt.merge(df((1L, "del", 10L)), Seq("id"), "updated_at",
      deleteWhen = Some(lit(true))) // older than base → loses the window
    assert(vt.read().select("payload").head().getString(0) == "base")
  }

  // --------------------------------------------------- log checkpoint

  test("checkpoint bounds manifest reads: a fresh handle reads O(1) files, not O(versions)") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((0L, "init", 0L)))
    (1 to 19).foreach(i => vt.append(df((i.toLong, s"r$i", i.toLong))))
    // 20 commits, default interval 10 → checkpoints at versions 9 and 19
    val fresh = VersionedTable(spark, root)
    assert(fresh.readAsOf(System.currentTimeMillis() + 1000).count() == 20)
    assert(fresh.history().size == 20)
    assert(fresh.manifestFsReads == 0,
      s"expected all manifests from the checkpoint, read ${fresh.manifestFsReads} files")
    // commits past the checkpoint are reconciled from the log listing
    vt.append(df((100L, "past-cp", 100L)))
    val fresh2 = VersionedTable(spark, root)
    assert(fresh2.history().size == 21)
    assert(fresh2.manifestFsReads == 1) // exactly the one uncheckpointed manifest
  }

  test("vacuum rewrites the checkpoint so dropped versions don't resurrect") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    (0 to 10).foreach(i => vt.append(df((i.toLong, s"r$i", i.toLong)))) // cp at v9
    vt.vacuum(keepVersions = 2)
    val fresh = VersionedTable(spark, root)
    assert(fresh.versions == Seq(9L, 10L))
    assert(fresh.history().map(_.version) == Seq(10L, 9L))
    assert(fresh.read().count() == 11) // appends accumulate; latest has all rows
  }

  test("vacuum past a pre-existing checkpoint: fresh-handle readAsOf is O(1) reads, no resurrection") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    (0 to 12).foreach(i => vt.append(df((i.toLong, s"r$i", i.toLong)))) // cp at v9 covers 0..9
    vt.vacuum(keepVersions = 3) // drops 0..9 — versions the old checkpoint still lists
    val fresh = VersionedTable(spark, root)
    assert(fresh.readAsOf(System.currentTimeMillis() + 1000).count() == 13)
    assert(fresh.versions == Seq(10L, 11L, 12L))
    // a timestamp before the oldest KEPT version resolves to no version at
    // all — never to a vacuumed one the stale checkpoint knew about
    val t10 = fresh.manifestOf(10L).timestampMs
    intercept[IllegalArgumentException] { fresh.readAsOf(t10 - 1) }
    assert(fresh.manifestFsReads == 0,
      s"rewritten checkpoint must cover all live versions, read ${fresh.manifestFsReads} manifest files")
  }

  test("restore rolls back metadata-only; history and later vacuum intact") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 11L)))
    vt.delete(col("id") === 1L)
    val rv = vt.restore(v0)
    assert(rv == 3L)
    assert(vt.read().orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
    assert(vt.history().head.operation == "restore")
    // the rolled-over versions are still time-travelable
    assert(vt.readVersion(2).count() == 2) // post-delete snapshot: ids 2,3
  }

  test("shallow clone: zero-copy reads, independent writes, safe vacuums") {
    val src = VersionedTable(spark, freshRoot())
    src.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    src.append(df((3L, "c", 11L)))

    val clone = src.shallowCloneTo(freshRoot())
    assert(clone.read().count() == 3)
    assert(clone.history().head.operation == "clone")

    // writes on the clone are invisible to the source
    clone.merge(df((2L, "b2", 20L), (4L, "d", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    assert(clone.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
    assert(src.read().collect().map(_.getString(1)).toSet == Set("a", "b", "c"))

    // delete on the clone (suffix-matched hit-dir discovery over foreign
    // absolute refs) removes the row without touching source data
    clone.delete(col("id") === 1L)
    assert(clone.read().collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    assert(src.read().count() == 3)

    // the clone's vacuum must never delete source-owned dirs
    clone.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(src.read().count() == 3)
    assert(clone.read().collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))

    // compact() materializes: afterwards every ref is clone-local
    clone.compact()
    val dirs = clone.manifestOf(clone.latestVersion.get).dataDirs
    assert(dirs.forall(d => !d.startsWith("/")), s"still foreign: $dirs")
  }

  test("shallow clone carries skipping stats; range read stays pruned + exact") {
    import spark.implicits._
    val src = VersionedTable(spark, freshRoot(), statsCols = Seq("updated_at"))
    (0 until 4).foreach { k =>
      src.append((1L to 10L).map(i => (k * 10L + i, s"p$k", k * 100L + i))
        .toDF("id", "payload", "updated_at"))
    }
    val clone = src.shallowCloneTo(freshRoot())
    val pruned = clone.candidateDirs(clone.latestVersion.get,
      "updated_at", 100L, 199L)
    assert(pruned.size == 1, s"stats did not carry: $pruned")
    val got = clone.readRange("updated_at", 100L, 199L)
      .collect().map(_.getLong(0)).toSet
    assert(got == (11L to 20L).toSet)
  }

  test("CHECK constraints reject violating commits atomically; null passes") {
    val vt = new VersionedTable(spark, freshRoot(), constraints = Seq(
      "nonneg_ts" -> "updated_at >= 0",
      "payload_set" -> "payload <> ''"))
    vt.overwrite(df((1L, "a", 10L)))

    // violating append: rejected BEFORE any commit — no new version
    val ex = intercept[VersionedTable.ConstraintViolationException] {
      vt.append(df((2L, "b", -5L), (3L, "", 7L)))
    }
    assert(ex.getMessage.contains("nonneg_ts") &&
      ex.getMessage.contains("payload_set"))
    assert(vt.versions == Seq(0L) && vt.read().count() == 1)

    // merge updates are validated too
    intercept[VersionedTable.ConstraintViolationException] {
      vt.merge(df((1L, "", 20L)), keyCols = Seq("id"), orderCol = "updated_at")
    }
    assert(vt.versions == Seq(0L))

    // SQL CHECK semantics: a NULL evaluation passes
    import spark.implicits._
    val withNull = Seq((4L, None: Option[String], 5L))
      .toDF("id", "payload", "updated_at")
    vt.append(withNull)
    assert(vt.read().count() == 2)
  }

  test("UPDATE rewrites only hit dirs; unmatched rows, schema, and time travel intact") {
    val vt = new VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 10L), (4L, "d", 10L)))
    val pre = vt.latestVersion.get
    val dirsBefore = vt.manifestOf(pre).dataDirs
    vt.update(col("id") === 4L,
      Map("payload" -> lit("D!"), "updated_at" -> (col("updated_at") + lit(5))))
    val after = vt.manifestOf(vt.latestVersion.get)
    // the first dir held no matched rows: carried by identity, stats intact
    assert(after.dataDirs.contains(dirsBefore.head))
    assert(after.stats.get(dirsBefore.head) == vt.manifestOf(pre).stats.get(dirsBefore.head))
    assert(after.dataDirs.size == 2 && !after.dataDirs.contains(dirsBefore(1)))
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L), (4L, "D!", 15L)))
    // time travel: pre-update snapshot unchanged
    assert(vt.readVersion(pre).filter(col("id") === 4L)
      .head().getString(1) == "d")
    // assignment casts to the committed column type (no schema drift)
    assert(vt.tableSchema == vt.schemaOf(pre))
    // no-match update commits a no-op version with the same file set
    val beforeNoop = vt.manifestOf(vt.latestVersion.get).dataDirs
    vt.update(col("id") === 99L, Map("payload" -> lit("zz")))
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs == beforeNoop)
    // unknown assignment column rejects
    intercept[IllegalArgumentException] {
      vt.update(col("id") === 1L, Map("nope" -> lit(1)))
    }
  }

  test("deletion-vector DELETE removes rows without rewriting any data dir") {
    val vt = new VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 10L), (4L, "d", 10L)))
    val pre = vt.latestVersion.get
    val dirsBefore = vt.manifestOf(pre).dataDirs
    vt.delete(col("id") === 2L || col("id") === 3L, useDeletionVectors = true)
    val m = vt.manifestOf(vt.latestVersion.get)
    // merge-on-read: the file set is IDENTICAL, only a DV was added
    assert(m.dataDirs == dirsBefore && m.dvs.size == 1 &&
      m.operation == "delete_dv")
    assert(vt.read().orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 4L))
    // time travel ignores the later DV; range/point reads apply it
    assert(vt.readVersion(pre).count() == 4)
    assert(vt.readRange("id", 1L, 4L).count() == 2)
    // second DV stacks on the first
    vt.delete(col("id") === 4L, useDeletionVectors = true)
    assert(vt.manifestOf(vt.latestVersion.get).dvs.size == 2)
    assert(vt.read().collect().map(_.getLong(0)).toSeq == Seq(1L))
    // no-match DV delete commits a no-op version, no third DV
    vt.delete(col("id") === 99L, useDeletionVectors = true)
    assert(vt.manifestOf(vt.latestVersion.get).dvs.size == 2)
  }

  test("DV'd rows never resurrect through merge; compact materializes DVs away") {
    val vt = new VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)))
    vt.delete(col("id") === 2L, useDeletionVectors = true)
    // merge an update for an untouched key: the rewrite of the hit dir
    // must materialize the DV (row 2 stays gone), and a NEW row for the
    // DV'd key arrives as a plain insert
    vt.merge(df((1L, "a2", 20L), (2L, "reborn", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    val out = vt.read().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a2"), (2L, "reborn"), (3L, "c")))
    // compact clears all DVs and preserves content
    val vt2 = new VersionedTable(spark, freshRoot())
    vt2.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt2.delete(col("id") === 1L, useDeletionVectors = true)
    vt2.compact()
    val m2 = vt2.manifestOf(vt2.latestVersion.get)
    assert(m2.dvs.isEmpty && m2.dataDirs.size == 1)
    assert(vt2.read().collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("vacuum drops DV files of dropped versions and keeps live ones") {
    val vt = new VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.delete(col("id") === 1L, useDeletionVectors = true)
    val liveDv = vt.manifestOf(vt.latestVersion.get).dvs.head
    vt.compact() // v2: DVs cleared
    vt.append(df((3L, "c", 11L)))
    val fs = new org.apache.hadoop.fs.Path(vt.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(vt.root, liveDv)))
    vt.vacuum(keepVersions = 2, orphanRetentionMs = 0L)
    // v0/v1 dropped → the DV file (referenced only by v1) is gone
    assert(!fs.exists(new org.apache.hadoop.fs.Path(vt.root, liveDv)))
    assert(vt.read().orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("bloom sidecars prune point lookups where min/max stats cannot") {
    // interleaved residues: every dir spans the full id range, so range
    // stats keep all dirs for any point — only the blooms can prune
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    (0 to 3).foreach { k =>
      vt.append(df((100 to 160).collect {
        case i if i % 4 == k => (i.toLong, s"p$i", 10L)
      }: _*))
    }
    val nDirs = vt.manifestOf(vt.latestVersion.get).dataDirs.size
    assert(nDirs == 4)
    // present key: candidates pruned below all-dirs, read is exact
    val cand = vt.pointCandidateDirs("id", 107L)
    assert(cand.size < nDirs && cand.nonEmpty)
    val hit = vt.readPoint("id", 107L).collect()
    assert(hit.map(_.getString(1)).toSeq == Seq("p107"))
    // absent key: no row survives regardless of bloom false positives
    assert(vt.readPoint("id", 999999L).count() == 0)
  }

  test("bloom sidecars carry through merge with untouched dirs; rewritten dir gets fresh blooms") {
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("id"), bloomCols = Seq("id"))
    (0 to 3).foreach { k =>
      vt.append(df((100 to 160).collect {
        case i if i % 4 == k => (i.toLong, s"p$i", 10L)
      }: _*))
    }
    // narrow merge touches only the residue-0 dir (keys 100, 104)
    vt.merge(df((100L, "upd100", 20L), (104L, "upd104", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    val nDirs = vt.manifestOf(vt.latestVersion.get).dataDirs.size
    // untouched dirs kept their sidecars: a residue-1 probe still prunes
    val cand = vt.pointCandidateDirs("id", 109L)
    assert(cand.size < nDirs)
    assert(vt.readPoint("id", 109L).collect().map(_.getString(1)).toSeq == Seq("p109"))
    // the rewritten dir's fresh bloom finds the merged row
    assert(vt.readPoint("id", 100L).collect().map(_.getString(1)).toSeq == Seq("upd100"))
  }

  test("string bloom columns and clustered-chunk sidecars prune point reads") {
    // stats track a DIFFERENT column, so min/max cannot prune payload
    // probes at all — only the per-chunk bloom sidecars can
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("updated_at"), bloomCols = Seq("payload"))
    vt.overwrite(df((1 to 200).map(i => (i.toLong, s"k${i % 50}", i.toLong)): _*))
    vt.append(df((201 to 400).map(i => (i.toLong, s"k${i % 50}", i.toLong)): _*))
    // clustering on payload alone confines each value to one chunk
    vt.compactClustered(Seq("payload"), nChunks = 4)
    val nDirs = vt.manifestOf(vt.latestVersion.get).dataDirs.size
    assert(nDirs >= 2)
    val cand = vt.pointCandidateDirs("payload", "k7")
    assert(cand.size < nDirs && cand.nonEmpty)
    val out = vt.readPoint("payload", "k7")
    assert(out.count() == 8 && out.filter(col("payload") =!= "k7").count() == 0)
  }

  test("incremental clustering rewrites only the unclustered tail; old chunks carry") {
    val vt = new VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    import spark.implicits._
    vt.overwrite((0L until 200L).map(i => (i, s"p$i", i))
      .toDF("id", "payload", "updated_at"))
    vt.compactClustered(Seq("id"), nChunks = 4)
    val chunkedBefore = vt.manifestOf(vt.latestVersion.get).dataDirs
    assert(chunkedBefore.forall(_.contains("_vt_chunk=")))
    vt.append((200L until 400L).map(i => (i, s"q$i", i))
      .toDF("id", "payload", "updated_at"))
    val v = vt.compactClusteredIncremental(Seq("id"), nChunks = 4)
    assert(v.isDefined)
    val m = vt.manifestOf(v.get)
    assert(chunkedBefore.forall(m.dataDirs.contains),
      "old chunk dirs must carry unchanged")
    assert(m.dataDirs.size == chunkedBefore.size + 4)
    assert(vt.read().count() == 400)
    // composed pruning: an old-range probe opens no new-batch chunk and
    // a new-range probe opens no old-batch chunk
    assert(vt.skipDirsFor(v.get, col("id") === 10L)
      .forall(chunkedBefore.contains))
    assert(vt.skipDirsFor(v.get, col("id") === 390L)
      .forall(d => !chunkedBefore.contains(d)))
    // nothing unclustered left → no-op
    assert(vt.compactClusteredIncremental(Seq("id"), nChunks = 4).isEmpty)
    assert(vt.readWhere(col("id") === 390L).count() == 1)
  }

  test("file-grain sidecar prunes part files inside a surviving dir") {
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("id"), fileStats = true)
    import spark.implicits._
    val data = (0L until 400L).map(i => (i, s"p$i", i))
      .toDF("id", "payload", "updated_at")
    // ONE data dir of 4 key-clustered part files: dir-grain stats span
    // [0, 399] and cannot prune anything — only the sidecar can
    vt.overwrite(data.repartitionByRange(4, col("id")))
    val v = vt.latestVersion.get
    val point = vt.scanTargetsFor(v, col("id") === 42L)
    assert(point.size == 1 && point.head.endsWith(".parquet"),
      s"point probe should open exactly one part file, got $point")
    val band = vt.scanTargetsFor(v,
      col("id") >= 90L && col("id") <= 110L)
    assert(band.size <= 2 && band.forall(_.endsWith(".parquet")),
      s"narrow band should open at most the two boundary files, got $band")
    // beyond-max probe opens NOTHING (dir survives, zero files do)
    assert(vt.scanTargetsFor(v, col("id") === 10000L).isEmpty)
    // pruning never changes results
    val got = vt.readWhere(col("id") >= 90L && col("id") <= 110L)
    val want = vt.read().filter(col("id") >= 90L && col("id") <= 110L)
    assert(got.count() == 21 && got.exceptAll(want).isEmpty &&
      want.exceptAll(got).isEmpty)
    // the explicit-bound readers ride the same sidecar pass
    assert(vt.readRange("id", 90L, 110L).count() == 21)
    assert(vt.readPoint("id", 42L).count() == 1)
    assert(vt.readRangeMulti(Seq(("id", 90L, 110L))).count() == 21)
  }

  test("file sidecars: all-null file prunes value leaves; merge keeps untouched sidecars") {
    val vt = new VersionedTable(spark, freshRoot(),
      statsCols = Seq("id", "updated_at"), fileStats = true)
    import spark.implicits._
    // file 0: updated_at all null; file 1: all non-null — the sidecar's
    // null ledger must let a value leaf prune the all-null file
    val a = (0L until 50L).map(i => (i, s"a$i", None: Option[Long]))
    val b = (50L until 100L).map(i => (i, s"b$i", Some(i)))
    val frame = (a ++ b).toDF("id", "payload", "updated_at")
      .repartitionByRange(2, col("id"))
    vt.overwrite(frame)
    val v0 = vt.latestVersion.get
    val nonNullProbe = vt.scanTargetsFor(v0, col("updated_at") >= 0L)
    assert(nonNullProbe.size == 1,
      s"value leaf should prune the all-null file, got $nonNullProbe")
    val isNullProbe = vt.scanTargetsFor(v0, col("updated_at").isNull)
    assert(isNullProbe.size == 1,
      s"IS NULL should prune the null-free file, got $isNullProbe")
    // a narrow merge rewrites one dir; the OTHER dir's sidecar must keep
    // file-pruning afterwards
    vt.append((100L until 200L).map(i => (i, s"c$i", Some(i)))
      .toDF("id", "payload", "updated_at").repartitionByRange(2, col("id")))
    vt.merge(Seq((150L, "upd", Some(999L))).toDF("id", "payload", "updated_at"),
      keyCols = Seq("id"), orderCol = "updated_at")
    val v2 = vt.latestVersion.get
    // id=60 lives in the untouched first dir: sidecar narrows to 1 file
    val after = vt.scanTargetsFor(v2, col("id") === 60L)
    assert(after.size == 1 && after.head.endsWith(".parquet"),
      s"untouched dir should still file-prune after merge, got $after")
    // and the merge result is correct end-to-end
    assert(vt.readWhere(col("id") === 150L).select("payload")
      .head().getString(0) == "upd")
  }

  test("CDF diff reads only the changed dirs, never the whole table") {
    val vt = VersionedTable(spark, freshRoot())
    // v0: dir A (ids 1-2); v1: + dir B (ids 3-4); v2: narrow merge
    // touching ONLY dir B's keys — B rewrites to C, A carries untouched
    vt.overwrite(df((1L, "a1", 10L), (2L, "a2", 10L)))
    vt.append(df((3L, "b1", 10L), (4L, "b2", 10L)))
    vt.merge(df((3L, "b1-new", 20L)), keyCols = Seq("id"),
      orderCol = "updated_at")

    // the keyed diff across the merge opens ONE dir per side (the
    // rewritten one), not the 2-dir snapshots
    val (fromDirs, toDirs) = vt.cdfChangedDirs(1L, 2L, keyed = true)
    assert(fromDirs.length == 1 && toDirs.length == 1,
      s"expected 1 changed dir per side, got $fromDirs -> $toDirs")
    assert(fromDirs != toDirs)
    // and the pruned diff's ROWS equal the legacy full-snapshot diff
    val got = vt.changesByKey(1L, 2L, Seq("id")).orderBy("id", "_change_type")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
        r.getAs[String]("_change_type"))).toSeq
    assert(got == Seq((3L, "b1-new", "update_postimage"),
      (3L, "b1", "update_preimage")), s"unexpected change rows: $got")

    // a window containing a blind APPEND cannot prune the keyed diff (an
    // append may silently duplicate a carried key) — full dir lists
    val (fa, ta) = vt.cdfChangedDirs(0L, 1L, keyed = true)
    assert(fa.length == 1 && ta.length == 2)
    // …but the ROW-GRAIN multiset diff prunes unconditionally: carried
    // multiplicities cancel exactly in exceptAll
    val (fr, tr) = vt.cdfChangedDirs(0L, 1L, keyed = false)
    assert(fr.isEmpty && tr.length == 1)
    val rowGrain = vt.changes(0L, 1L).orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSeq
    assert(rowGrain == Seq((3L, "insert"), (4L, "insert")))

    // a DV delete keeps the dir carried but changes its EFFECTIVE rows —
    // the dir must re-enter the diff on both sides
    vt.delete(col("id") === 1L, useDeletionVectors = true)
    assert(vt.history().head.operation == "delete_dv")
    val (fd, td) = vt.cdfChangedDirs(2L, 3L, keyed = true)
    assert(fd == td && fd.length == 1,
      s"DV-touched carried dir must diff: $fd -> $td")
    val dvChg = vt.changesByKey(2L, 3L, Seq("id")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type"))).toSeq
    assert(dvChg == Seq((1L, "delete")))

    // identical versions: zero dirs, zero rows
    val (fz, tz) = vt.cdfChangedDirs(3L, 3L, keyed = true)
    assert(fz.isEmpty && tz.isEmpty)
    assert(vt.changesByKey(3L, 3L, Seq("id")).isEmpty)
  }

  test("write-time CDF materialization: file-served reads, fallback, vacuum sweep") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 10L)))
    spark.conf.set(graft.sources.VersionedTable.WriteCdfConf, "true")
    try {
      vt.merge(df((2L, "b2", 20L)), keyCols = Seq("id"),
        orderCol = "updated_at") // v2: rewrite → materialized
      val cdDir = new java.io.File(s"${vt.root}/_change_data/v0000000002")
      assert(cdDir.exists, "merge under graft.cdf.write must materialize")
      // both CDF spellings serve from the FILE (no data/ dir in the plan)…
      val keyed = vt.changesByKey(1L, 2L, Seq("id"))
      keyed.collect()
      val plan = keyed.queryExecution.executedPlan.toString
      assert(plan.contains("_change_data") && !plan.contains("/data/c"),
        s"keyed CDF must read the change file, not the dirs:\n$plan")
      // …and the rows equal the recomputed diff exactly
      val got = keyed.orderBy("_change_type").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
          r.getAs[String]("_change_type"))).toSeq
      assert(got == Seq((2L, "b2", "update_postimage"),
        (2L, "b", "update_preimage")))
      val rowGrain = vt.changes(1L, 2L).orderBy("_change_type").collect()
        .map(r => (r.getAs[String]("payload"),
          r.getAs[String]("_change_type"))).toSeq
      assert(rowGrain == Seq(("b", "delete"), ("b2", "insert")))
      // appends never materialize (their pruned diff IS the change set)
      vt.append(df((4L, "d", 10L)))
      assert(!new java.io.File(s"${vt.root}/_change_data/v0000000003")
        .exists)
      // removing the file falls back to the pruned diff with equal rows
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(cdDir)
      val recomputed = vt.changesByKey(1L, 2L, Seq("id"))
        .orderBy("_change_type").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
          r.getAs[String]("_change_type"))).toSeq
      assert(recomputed == got)
      // a PARTIAL materialization (dir present, no _SUCCESS job marker —
      // a crashed writer) must fall back to the pruned diff, not crash
      // or serve an incomplete file set
      val partial = new java.io.File(s"${vt.root}/_change_data/v0000000002")
      partial.mkdirs()
      java.nio.file.Files.writeString(
        partial.toPath.resolve("part-junk.parquet"), "not parquet")
      val afterPartial = vt.changesByKey(1L, 2L, Seq("id"))
        .orderBy("_change_type").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"),
          r.getAs[String]("_change_type"))).toSeq
      assert(afterPartial == got)
      rm(partial)

      // vacuum sweeps the change files of DROPPED versions only
      vt.merge(df((3L, "c2", 30L)), keyCols = Seq("id"),
        orderCol = "updated_at") // v4: materialized
      vt.append(df((5L, "e", 10L))) // v5 (kept below)
      assert(new java.io.File(s"${vt.root}/_change_data/v0000000004")
        .exists)
      vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
      assert(!new java.io.File(s"${vt.root}/_change_data/v0000000004")
        .exists)
    } finally spark.conf.unset(graft.sources.VersionedTable.WriteCdfConf)
  }
}
