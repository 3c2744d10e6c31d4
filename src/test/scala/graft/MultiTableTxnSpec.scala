package graft

import org.apache.spark.sql.functions._

import graft.sources.{MultiTableTxn, VersionedTable}

/** Cross-table atomic visibility ([[graft.sources.MultiTableTxn]]):
  * stage member commits, stamp one transaction file; unstamped stages
  * are invisible, carried tables pin the PREVIOUS transaction's version
  * (never latest), stamp races fail-if-exist and re-stamp cleanly, and
  * the transaction-aware vacuum keeps exactly the pinned versions.
  */
class MultiTableTxnSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String = {
    val r = s"${System.getProperty("java.io.tmpdir")}/graft_mtx_${name}_${spark.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(r)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    r
  }

  test("all-or-nothing visibility across two tables; carry-forward pins") {
    val root = freshRoot("vis")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val stats = VersionedTable(spark, s"$root/stats")
    val txn = MultiTableTxn(spark, root)

    val v0c = corpus.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "src"))
    val v0s = stats.overwrite(Seq(("a", 1L), ("b", 1L)).toDF("src", "n"))
    val t0 = txn.commit("bootstrap",
      Seq(("corpus", corpus, v0c), ("stats", stats, v0s)))
    assert(t0 == 0L)

    // stage a corpus append WITHOUT stamping: direct readers see it,
    // transaction readers must not
    corpus.append(Seq((3L, "a")).toDF("id", "src"))
    assert(corpus.read().count() === 3L)
    assert(txn.readAt(t0, "corpus").count() === 2L,
      "unstamped stage leaked into the transaction view")

    // a later txn staging ONLY stats must carry corpus at the PINNED
    // version (v0), not at its latest (the half-staged v1)
    val v1s = stats.overwrite(Seq(("a", 2L), ("b", 1L)).toDF("src", "n"))
    val t1 = txn.commit("stats_refresh", Seq(("stats", stats, v1s)))
    assert(txn.readAt(t1, "corpus").count() === 2L,
      "carry-forward must pin the previous txn's version, never latest")
    assert(txn.readAt(t1, "stats").filter(col("src") === "a")
      .head().getLong(1) === 2L)

    // now stamp the corpus batch properly; both move together
    val v1c = corpus.latestVersion.get
    val t2 = txn.commit("daily_load", Seq(("corpus", corpus, v1c)))
    assert(txn.readAt(t2, "corpus").count() === 3L)
    assert(txn.vector(t2)("stats")._2 === v1s)

    // unknown table / vacuumed txn fail loudly
    val e1 = intercept[IllegalArgumentException](txn.readAt(t2, "nope"))
    assert(e1.getMessage.contains("records no table"), e1.getMessage)
  }

  test("stamp race fails-if-exists; commitRetrying re-stamps metadata-only") {
    val root = freshRoot("race")
    val t = VersionedTable(spark, s"$root/t")
    val v0 = t.overwrite(Seq(1L, 2L).toDF("id"))
    val txn = MultiTableTxn(spark, root)
    txn.commit("bootstrap", Seq(("t", t, v0)))
    // the real race shape: two stampers both computed the next id before
    // either renamed — replay it via the split-out stamp step
    val racedId = txn.latest.get + 1
    val vec = Map("t" -> ((s"$root/t", v0)))
    val other = MultiTableTxn(spark, root)
    assert(other.stamp(racedId, "winner-by-rename", vec) === racedId)
    val e = intercept[VersionedTable.ConcurrentWriteException] {
      txn.stamp(racedId, "loser", vec)
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // the loser's staged member commit is durable: re-stamping under a
    // fresh id is metadata-only and succeeds
    val id = txn.commitRetrying("re-stamped", Seq(("t", t, v0)))
    assert(id == txn.latest.get && id > racedId)
    assert(txn.detail(id)._1 === "re-stamped")
  }

  test("a PARTITIONED member pins coordinator snapshots; vacuum honors them") {
    import graft.sources.PartitionedVersionedTable
    val root = freshRoot("shard")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val events = PartitionedVersionedTable(spark, s"$root/events", "src")
    val txn = MultiTableTxn(spark, root)

    val vc0 = corpus.overwrite(Seq((1L, "x")).toDF("id", "t"))
    val s0 = events.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "src", "n"))
    val t0 = txn.commitAt("bootstrap",
      Seq(("corpus", s"$root/corpus", vc0), ("events", s"$root/events", s0)))
    // stage a sharded append WITHOUT stamping: invisible at the txn
    events.append(Seq((3L, "a", 30L)).toDF("id", "src", "n"))
    assert(events.read().count() === 3L)
    assert(txn.readAt(t0, "events").count() === 2L,
      "unstamped sharded stage leaked into the transaction view")
    // stamp the sharded advance; the flat member carries forward
    val s1 = events.latestSnapshot.get
    val t1 = txn.commitAt("load", Seq(("events", s"$root/events", s1)))
    assert(txn.readAt(t1, "events").count() === 3L)
    assert(txn.readAt(t1, "corpus").count() === 1L)
    // snapshot 2 unpinned by any txn after this overwrite...
    events.overwrite(Seq((9L, "a", 90L)).toDF("id", "src", "n"))
    // ...txn-aware vacuum keeps exactly the pinned snapshots (plus the
    // member's own latest): both pinned states stay readable
    txn.vacuum(keepTxns = 2, orphanRetentionMs = 0L)
    assert(txn.readAt(t0, "events").count() === 2L,
      "pinned sharded snapshot lost to vacuum")
    assert(txn.readAt(t1, "events").count() === 3L)
  }

  test("streamed substr-screen loop == sequential batch screens (parity)") {
    import graft.operators.Dedup
    // the production daily loop AS A STREAM: doc batches arrive on a
    // governed table, each micro-batch screens against the txn-pinned
    // index, then appends its counts and stamps the next transaction —
    // the spans across batches must equal running the batch API
    // sequentially with the same arrival order (order MATTERS: batch 2's
    // windows count the index including batch 1)
    val root = freshRoot("stream")
    val feed = VersionedTable(spark, s"$root/feed")
    val index = VersionedTable(spark, s"$root/index")
    val txn = MultiTableTxn(spark, root)
    val base = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val b1 = Seq((10L, "x a b c d e x2"), // dup vs base
                 (11L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val b2 = Seq((20L, "z w1 w2 w3 w4 w5 z2"), // dup vs batch 1's index
                 (21L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val w = 5
    val iv0 = index.overwrite(Dedup.exactSubstrIndex(base, windowTokens = w))
    txn.commitAt("bootstrap", Seq(("index", s"$root/index", iv0)))
    feed.overwrite(b1)

    val got = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    val q = spark.readStream.format("graft").option("keyCols", "doc_id")
      .load(s"$root/feed")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = batch.filter(col("_change_type") === "insert")
          .select("doc_id", "text").localCheckpoint(true)
        if (!docs.isEmpty) {
          val t = txn.latest.get
          got ++= Dedup.exactSubstrSpansIncremental(docs,
              txn.readAt(t, "index"), windowTokens = w)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          val iv = index.append(Dedup.exactSubstrIndex(docs, windowTokens = w))
          txn.commitAt("daily", Seq(("index", s"$root/index", iv)))
          ()
        }
      }.start()
    try {
      q.processAllAvailable()
      feed.append(b2) // lands LIVE as its own micro-batch
      q.processAllAvailable()
    } finally q.stop()

    // sequential batch-API reference with the same arrival order
    val ref = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    val refIdx0 = Dedup.exactSubstrIndex(base, windowTokens = w)
    ref ++= Dedup.exactSubstrSpansIncremental(b1, refIdx0, windowTokens = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val refIdx1 = refIdx0.unionAll(Dedup.exactSubstrIndex(b1, windowTokens = w))
    ref ++= Dedup.exactSubstrSpansIncremental(b2, refIdx1, windowTokens = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === ref.toSet,
      s"stream=${got.toSet} batch=${ref.toSet}")
    // and the order-dependence is REAL: doc 20 dups only via batch 1
    assert(got.exists(_._1 == 20L), got.toString)
    assert(txn.latest.get === 2L, "one stamp per non-empty batch")
  }

  test("transaction-aware vacuum keeps pinned versions, drops the rest") {
    val root = freshRoot("vac")
    val t = VersionedTable(spark, s"$root/t")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq(1L).toDF("id"))
    txn.commit("w0", Seq(("t", t, v0)))
    val v1 = t.overwrite(Seq(1L, 2L).toDF("id"))
    txn.commit("w1", Seq(("t", t, v1)))
    val v2 = t.overwrite(Seq(1L, 2L, 3L).toDF("id"))
    val t2 = txn.commit("w2", Seq(("t", t, v2)))
    assert(txn.pinnedVersions("t") === Set(v0, v1, v2))

    txn.vacuum(keepTxns = 2, orphanRetentionMs = 0L)
    assert(txn.txns.size === 2)
    assert(txn.pinnedVersions("t") === Set(v1, v2))
    // surviving transactions still read their exact pinned versions
    assert(txn.readAt(t2, "t").count() === 3L)
    assert(txn.readAt(t2 - 1, "t").count() === 2L)
    // the dropped transaction's version is gone from the member log
    assert(!t.versions.contains(v0), s"v0 survived: ${t.versions}")
    // and reading the vacuumed transaction fails loudly, never silently
    val e = intercept[IllegalArgumentException](txn.readAt(t2 - 2, "t"))
    assert(e.getMessage.contains("vacuumed or never committed"), e.getMessage)
  }

  test("streamChanges: one batch per stamp, unstamped stages invisible, " +
    "carry-forward stamps emit empty batches") {
    val root = freshRoot("stream")
    val t = VersionedTable(spark, s"$root/t")
    val aux = VersionedTable(spark, s"$root/aux")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "src"))
    txn.commit("w0", Seq(("t", t, v0)))
    val v1 = t.append(Seq((3L, "a")).toDF("id", "src"))
    txn.commit("w1", Seq(("t", t, v1)))
    // staged but never stamped: the member's own CDF would leak this row
    t.append(Seq((99L, "zz")).toDF("id", "src"))
    // carry-forward stamp: aux moves, t's pin does not
    val va = aux.overwrite(Seq(("a", 2L)).toDF("src", "n"))
    txn.commit("w2", Seq(("aux", aux, va)))

    val got = scala.collection.mutable.Map.empty[Long, Seq[Seq[Any]]]
    val q = txn.streamChanges("t", keyCols = Seq("id"), s"$root/spool")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got.synchronized { got(id) = b.collect().toSeq.map(_.toSeq) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    assert(got.keySet == Set(0L, 1L, 2L),
      s"one batch per stamped transaction, got ${got.keySet}")
    def ids(b: Long) = got(b).map(_.head.asInstanceOf[Long]).toSet
    // row layout: (id, src, _change_type, _commit_version, _txn_id)
    assert(ids(0) == Set(1L, 2L), "anchor batch = txn 0's pinned snapshot")
    assert(got(0).forall(r => r(2) == "insert" && r(4) == 0L))
    assert(ids(1) == Set(3L), "batch 1 = txn 1's keyed diff")
    assert(got(1).forall(r => r(2) == "insert" && r(4) == 1L))
    assert(got(2).isEmpty, "carry-forward stamp must emit an empty batch")
    assert(!got.values.flatten.exists(_.head == 99L),
      "a staged-but-unstamped member commit leaked into the stream")
  }

  test("LIVE txn source: stamps landing after stream start arrive as " +
    "batches; staged-but-unstamped commits stay invisible at every trigger") {
    val root = freshRoot("live")
    val t = VersionedTable(spark, s"$root/t")
    val aux = VersionedTable(spark, s"$root/aux")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "src"))
    txn.commit("w0", Seq(("t", t, v0)))

    val got = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Any]]]
    val q = spark.readStream.format("graft")
      .option("txnLog", root).option("table", "t").option("keyCols", "id")
      .load(s"$root/t")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got += b.collect().toSeq.map(_.toSeq) }
        ()
      }.start()
    try {
      q.processAllAvailable() // batch: txn 0's pinned snapshot as inserts
      // landing AFTER stream start — the capability under test: a stamped
      // daily load, then a staged append that never stamps (invisible
      // until some later stamp covers t — none does here), then a
      // carry-forward stamp on ANOTHER table, which advances the offset
      // without emitting t rows
      val v1 = t.append(Seq((3L, "a")).toDF("id", "src"))
      txn.commit("daily_load", Seq(("t", t, v1)))
      q.processAllAvailable() // batch: txn 1's keyed diff (id 3)
      t.append(Seq((99L, "zz")).toDF("id", "src")) // staged, NOT stamped
      q.processAllAvailable() // trigger: offset unchanged, nothing emitted
      val va = aux.overwrite(Seq(("a", 2L)).toDF("src", "n"))
      txn.commit("stats_refresh", Seq(("aux", aux, va))) // carry-forward
      q.processAllAvailable() // batch: empty (t's pin did not move)
    } finally q.stop()

    val all = got.synchronized(got.toSeq)
    val rows = all.flatten
    // snapshot batch: ids {1,2} as inserts stamped txn 0
    assert(all.head.map(_.head).toSet == Set(1L, 2L))
    assert(all.head.forall(r => r(2) == "insert" && r(4) == 0L))
    // the live diff arrived (id 3, stamped txn 1); the staged id 99 never
    // appears in ANY batch even though it sat in the member log while
    // triggers fired
    assert(rows.exists(r => r.head == 3L && r(4) == 1L))
    assert(!rows.exists(_.head == 99L),
      "staged-but-unstamped member commit leaked into the live stream")
    // total data rows: 2 snapshot + 1 diff (carry-forward adds none)
    assert(rows.size == 3, s"unexpected rows: $rows")
  }

  test("stamp validates staged pins exist — a typo'd or vacuumed version " +
    "fails at commit time, not at a later readAt") {
    val root = freshRoot("pinval")
    val t = VersionedTable(spark, s"$root/t")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq(1L).toDF("id"))
    txn.commit("w0", Seq(("t", t, v0)))
    val e = intercept[IllegalArgumentException] {
      txn.commitAt("typo", Seq(("t", s"$root/t", 99L)))
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    assert(txn.txns.size === 1, "the invalid stamp must not commit")
  }

  test("vacuum keeps versions superseded inside the in-flight window: a " +
    "staged-then-superseded commit survives until its writer stamps") {
    val root = freshRoot("inflight")
    val t = VersionedTable(spark, s"$root/t")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq(1L).toDF("id"))
    txn.commit("w0", Seq(("t", t, v0)))
    // writer A stages v1 for a transaction it has NOT stamped yet;
    // writer B's v2 supersedes it and stamps — v1 is now pinned by
    // nothing, latest of nothing, and (pre-fix) first in line for vacuum
    val v1 = t.append(Seq(2L).toDF("id"))
    val v2 = t.append(Seq(3L).toDF("id"))
    txn.commit("w2", Seq(("t", t, v2)))
    txn.vacuum(keepTxns = 1) // default 1h window
    assert(t.versions.contains(v1),
      "in-flight staged version must survive a concurrent vacuum")
    // A's stamp now lands on a version that still exists and reads back
    val tA = txn.commitAt("a_load", Seq(("t", s"$root/t", v1)))
    assert(txn.readAt(tA, "t").count() === 2L)
    // ... and once every live stamp has moved on, a zero-window vacuum
    // reclaims what the floor was protecting (the floor is a window,
    // not a leak)
    val v3 = t.append(Seq(4L).toDF("id"))
    txn.commit("w3", Seq(("t", t, v3)))
    txn.vacuum(keepTxns = 1, orphanRetentionMs = 0L)
    assert(!t.versions.contains(v0) && !t.versions.contains(v1),
      s"zero-window vacuum must reclaim unpinned versions: ${t.versions}")
  }

  test("vacuum sweeps crashed-stamper .tmp debris past the window, " +
    "and a partial-vacuum re-run is idempotent") {
    val root = freshRoot("debris")
    val t = VersionedTable(spark, s"$root/t")
    val txn = MultiTableTxn(spark, root)
    val v0 = t.overwrite(Seq(1L).toDF("id"))
    txn.commit("w0", Seq(("t", t, v0)))
    val v1 = t.overwrite(Seq(1L, 2L).toDF("id"))
    txn.commit("w1", Seq(("t", t, v1)))
    // a stamper that died between tmp-create and rename
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/_txnlog/.tmp-7-deadbeef")
    val out = fs.create(tmp, true)
    try out.write("{}".getBytes("UTF-8")) finally out.close()
    // inside the window: survives (could be a live stamper's ms-old file)
    txn.vacuum(keepTxns = 2)
    assert(fs.exists(tmp), "young tmp debris is inside the in-flight window")
    // past the window: swept
    txn.vacuum(keepTxns = 2, orphanRetentionMs = 0L)
    assert(!fs.exists(tmp), "aged tmp debris must be swept")

    // partial-vacuum crash window: manifests drop BEFORE members vacuum,
    // so simulate a crash right between the two and re-run — the re-run
    // must complete the member sweep without error (benign debris only)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/_txnlog/${"%020d".format(0L)}.json"), false)
    assert(t.versions.contains(v0), "crash left the unpinned member version")
    txn.vacuum(keepTxns = 2, orphanRetentionMs = 0L)
    assert(!t.versions.contains(v0),
      "re-run vacuum must reclaim the orphaned member version")
    assert(txn.readAt(txn.latest.get, "t").count() === 2L)
  }

  test("cloneAt forks every member at the txn's pins (not latest); " +
    "divergence is isolated both ways; source vacuum honors the fork's " +
    "transaction pin") {
    val root = freshRoot("fork")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val stats = VersionedTable(spark, s"$root/stats")
    val txn = MultiTableTxn(spark, root)
    val v0c = corpus.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "src"))
    val v0s = stats.overwrite(Seq(("a", 1L), ("b", 1L)).toDF("src", "n"))
    txn.commit("bootstrap", Seq(("corpus", corpus, v0c), ("stats", stats, v0s)))
    val v1c = corpus.append(Seq((3L, "a")).toDF("id", "src"))
    val v1s = stats.overwrite(Seq(("a", 2L), ("b", 1L)).toDF("src", "n"))
    val t1 = txn.commit("daily_load",
      Seq(("corpus", corpus, v1c), ("stats", stats, v1s)))
    // the source moves PAST the fork point: a stamped delete at t2 and an
    // unstamped staged append — neither may reach the fork
    corpus.delete(col("id") === 2L)
    txn.commit("purge", Seq(("corpus", corpus, corpus.latestVersion.get)))
    corpus.append(Seq((99L, "zz")).toDF("id", "src"))

    val fork = txn.cloneAt(t1, s"$root/fork")
    assert(fork.txns === Seq(0L))
    assert(fork.detail(0L)._1 === s"txn_clone:$t1")
    // fork state ≡ source state AT t1, member by member (corpus pinned a
    // version the source has since moved past)
    val a = fork.readAt(0L, "corpus")
    val b = txn.readAt(t1, "corpus")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "forked corpus must equal the source's txn-pinned state")
    assert(fork.readAt(0L, "stats").filter(col("src") === "a")
      .head().getLong(1) === 2L)
    // diverge the FORK: append + stamp on the fork's own log — the
    // source's pinned view must not move
    val fc = new VersionedTable(spark, s"$root/fork/tables/corpus")
    val vf = fc.append(Seq((500L, "f")).toDF("id", "src"))
    fork.commitAt("fork_load", Seq(("corpus", s"$root/fork/tables/corpus", vf)))
    assert(fork.readAt(1L, "corpus").count() === 4L)
    assert(txn.readAt(t1, "corpus").count() === 3L,
      "fork divergence leaked into the source")
    assert(txn.readAt(txn.latest.get, "corpus").count() === 2L)
    // source vacuum: t1 is within keepTxns, so its pins survive and the
    // fork (whose manifests reference source FILES at those pins) still
    // reads — the retention contract cloneAt documents
    txn.vacuum(keepTxns = 2, orphanRetentionMs = 0L)
    assert(fork.readAt(1L, "corpus").count() === 4L,
      "source vacuum dropped files the fork's retained txn still pins")
    // a fresh-log requirement and a vacuumed/unknown txn fail loudly
    val e1 = intercept[IllegalArgumentException](
      txn.cloneAt(t1, s"$root/fork"))
    assert(e1.getMessage.contains("already holds transactions"))
    val e2 = intercept[IllegalArgumentException](
      txn.cloneAt(77L, s"$root/fork2"))
    assert(e2.getMessage.contains("not found"), e2.getMessage)
  }

  test("materialize makes a fork self-owned: a bone-dry source vacuum " +
    "cannot break it, and a staged member tail never leaks into the fold") {
    val root = freshRoot("mat")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val txn = MultiTableTxn(spark, root)
    val v0 = corpus.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "src", "n"))
    val t0 = txn.commit("bootstrap", Seq(("corpus", corpus, v0)))
    val fork = txn.cloneAt(t0, s"$root/fork")
    // a staged-but-unstamped tail on the fork member: materialize folds
    // the PINNED state, so the tail must not leak into the new stamp
    val fc = new VersionedTable(spark, s"$root/fork/tables/corpus")
    fc.append(Seq((99L, "zz", 990L)).toDF("id", "src", "n"))
    val tm = fork.materialize(0L)
    assert(fork.detail(tm)._1 === "txn_materialize:0")
    assert(fork.readAt(tm, "corpus").count() === 3L,
      "staged tail leaked into the materialized stamp")
    // fork retires its foreign-referencing manifests (the foreign guard
    // keeps source-owned files alive for the source to reclaim) ...
    fc.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    // ... and the SOURCE vacuums to the bone: new stamp, keep only it,
    // zero retention — v0's files are gone
    val v1 = corpus.overwrite(Seq((9L, "x", 90L)).toDF("id", "src", "n"))
    txn.commit("rewrite", Seq(("corpus", corpus, v1)))
    txn.vacuum(keepTxns = 1, orphanRetentionMs = 0L)
    assert(!corpus.versions.contains(v0), "source vacuum should drop v0")
    assert(fork.readAt(tm, "corpus").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L),
      "a materialized fork must survive any source vacuum")
  }

  test("readAsOf resolves the newest stamp <= ts; diffAt classifies the " +
    "fork's divergence against the moved-on source") {
    val root = freshRoot("asofdiff")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val txn = MultiTableTxn(spark, root)
    val v0 = corpus.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "src", "n"))
    val t0 = txn.commit("bootstrap", Seq(("corpus", corpus, v0)))
    val fork = txn.cloneAt(t0, s"$root/fork")
    Thread.sleep(10) // distinct stamp timestamps for the AS OF probe
    val v1 = corpus.append(Seq((4L, "d", 40L)).toDF("id", "src", "n"))
    val t1 = txn.commit("src_load", Seq(("corpus", corpus, v1)))
    val (ts0, ts1) = (txn.detail(t0)._2, txn.detail(t1)._2)
    assert(txn.asOfTimestamp(ts0) === t0)
    assert(txn.asOfTimestamp(ts1) === t1)
    assert(txn.readAsOf(ts0, "corpus").count() === 3L)
    assert(txn.readAsOf(ts1, "corpus").count() === 4L)
    val e = intercept[IllegalArgumentException](txn.asOfTimestamp(ts0 - 1))
    assert(e.getMessage.contains("no transaction stamped"), e.getMessage)
    // the fork runs its experiment: an update, a delete, an append
    val fc = new VersionedTable(spark, s"$root/fork/tables/corpus")
    fc.update(col("id") === 2L, Map("n" -> (col("n") + lit(5))))
    fc.delete(col("id") === 3L)
    val vf = fc.append(Seq((100L, "z", 1L)).toDF("id", "src", "n"))
    val tf = fork.commitAtRetrying("fork_load",
      Seq(("corpus", s"$root/fork/tables/corpus", vf)))
    val diff = txn.diffAt(t1, "corpus", fork, tf, Seq("id")).collect()
      .map(r => (r.getString(3), r.getLong(0)) -> r.getLong(2)).toMap
    assert(diff === Map(
      ("insert", 100L) -> 1L, // the fork's append
      ("delete", 3L) -> 30L, // the fork's delete
      ("delete", 4L) -> 40L, // the source's post-fork load, absent here
      ("update_preimage", 2L) -> 20L,
      ("update_postimage", 2L) -> 25L))
  }

  test("property: diffAt is an EXACT delta — empty at the fork point, " +
    "and applying it to the source state reconstructs the fork state " +
    "(seeded random mutation rounds)") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 3) {
      val root = freshRoot(s"prop$round")
      val n = 20 + rnd.nextInt(30)
      val base = (0L until n.toLong).map(i =>
        (i, s"s${rnd.nextInt(3)}", rnd.nextInt(100).toLong))
      val corpus = VersionedTable(spark, s"$root/corpus")
      val txn = MultiTableTxn(spark, root)
      val v0 = corpus.overwrite(base.toDF("id", "src", "n"))
      val t0 = txn.commit("bootstrap", Seq(("corpus", corpus, v0)))
      val fork = txn.cloneAt(t0, s"$root/fork")
      assert(txn.diffAt(t0, "corpus", fork, 0L, Seq("id")).isEmpty,
        "diff at the fork point must be empty")
      // random experiment on the fork: a delete, an update, an append
      val fc = new VersionedTable(spark, s"$root/fork/tables/corpus")
      fc.delete(col("id") % (2 + rnd.nextInt(4)) === 0L)
      fc.update(col("id") % (2 + rnd.nextInt(3)) === 1L,
        Map("n" -> (col("n") + lit(1L + rnd.nextInt(10)))))
      val extra = (0 until 1 + rnd.nextInt(5)).map(k =>
        (1000L + k, s"s${rnd.nextInt(3)}", rnd.nextInt(100).toLong))
      val vf = fc.append(extra.toDF("id", "src", "n"))
      fork.commitAtRetrying("fork_load",
        Seq(("corpus", s"$root/fork/tables/corpus", vf)))
      // delta-exactness: source state − (deletes ∪ preimages) ∪
      // (inserts ∪ postimages) ≡ fork state
      val diff = txn.diffAt(t0, "corpus", fork, 1L, Seq("id"))
        .localCheckpoint(true)
      val a = txn.readAt(t0, "corpus")
      val gone = diff.filter(col("_change_type")
        .isin("delete", "update_preimage")).select("id")
      val added = diff.filter(col("_change_type")
        .isin("insert", "update_postimage")).drop("_change_type")
      val rebuilt = a.join(gone, Seq("id"), "left_anti").unionByName(added)
      val b = fork.readAt(1L, "corpus")
      assert(rebuilt.exceptAll(b).isEmpty && b.exceptAll(rebuilt).isEmpty,
        s"round $round: applying the diff must reconstruct the fork state")
    }
  }

  test("CLI txn verb family drives the full fork arc: history -> fork -> " +
    "diverge -> diff -> materialize") {
    val root = freshRoot("cliarc")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val txn = MultiTableTxn(spark, root)
    val v0 = corpus.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "src", "n"))
    txn.commit("bootstrap", Seq(("corpus", corpus, v0)))
    Cli.run(spark, Array("txn", "history", root))
    Cli.run(spark, Array("txn", "fork", root, "0", s"$root/fork"))
    val fork = MultiTableTxn(spark, s"$root/fork")
    assert(fork.txns === Seq(0L))
    assert(fork.readAt(0L, "corpus").count() === 2L)
    // diverge the fork, then the CLI diff (smoke: prints per-class counts)
    val fc = new VersionedTable(spark, s"$root/fork/tables/corpus")
    val vf = fc.append(Seq((3L, "c", 30L)).toDF("id", "src", "n"))
    fork.commitAtRetrying("fork_load",
      Seq(("corpus", s"$root/fork/tables/corpus", vf)))
    Cli.run(spark, Array("txn", "diff", root, "0", s"$root/fork", "1",
      "corpus", "id"))
    Cli.run(spark, Array("txn", "materialize", s"$root/fork", "1"))
    assert(fork.detail(fork.latest.get)._1 === "txn_materialize:1")
    assert(fork.readAt(fork.latest.get, "corpus").count() === 3L)
  }

  test("rebase conflict policies: fail names the clashing keys, ours " +
    "keeps the fork's versions, theirs applies the source's (including " +
    "delete-vs-update both ways)") {
    val root = freshRoot("rebase")
    val corpus = VersionedTable(spark, s"$root/corpus")
    val txn = MultiTableTxn(spark, root)
    val v0 = corpus.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "src", "n"))
    val t0 = txn.commit("bootstrap", Seq(("corpus", corpus, v0)))
    // three forks of the SAME pin, one per policy
    val forks = Seq("f1", "f2", "f3").map(f => f -> txn.cloneAt(t0, s"$root/$f"))
    // upstream: update id=2, delete id=3, stamp
    corpus.update(col("id") === 2L, Map("n" -> lit(21L)))
    corpus.delete(col("id") === 3L)
    val tSrc = txn.commit("src_load",
      Seq(("corpus", corpus, corpus.latestVersion.get)))
    // every fork diverges identically: id=2 updated (clash with the
    // source's update), id=3 updated (clash with the source's DELETE),
    // id=4 appended (no clash)
    forks.foreach { case (f, fk) =>
      val fc = new VersionedTable(spark, s"$root/$f/tables/corpus")
      fc.update(col("id") === 2L, Map("n" -> lit(22L)))
      fc.update(col("id") === 3L, Map("n" -> lit(33L)))
      val v = fc.append(Seq((4L, "d", 40L)).toDF("id", "src", "n"))
      fk.commitAtRetrying("fork_load",
        Seq(("corpus", s"$root/$f/tables/corpus", v)))
    }
    val keys = (_: String) => Seq("id")
    // fail: throws naming the member and both clashing keys; nothing stamps
    val (f1, fk1) = ("f1", forks(0)._2)
    val e = intercept[IllegalStateException](fk1.rebase(txn, keys))
    assert(e.getMessage.contains("corpus") && e.getMessage.contains("2 key"),
      e.getMessage)
    assert(fk1.txns.size === 2, "a failed rebase must stamp nothing")
    // ours: the fork's versions survive; only the non-conflicting part
    // of the upstream delta lands (none here beyond the clashes)
    val fk2 = forks(1)._2
    val t2 = fk2.rebase(txn, keys, policy = "ours")
    assert(fk2.detail(t2)._1 === s"txn_rebase:$tSrc")
    assert(fk2.readAt(t2, "corpus").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(1L -> 10L, 2L -> 22L, 3L -> 33L, 4L -> 40L))
    // theirs: the source wins — id=2 takes the upstream value, id=3 is
    // deleted even though the fork updated it
    val fk3 = forks(2)._2
    val t3 = fk3.rebase(txn, keys, policy = "theirs")
    assert(fk3.readAt(t3, "corpus").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(1L -> 10L, 2L -> 21L, 4L -> 40L))
    // second pull after ANOTHER upstream move applies only the new delta
    // (the sync point advanced), and theirs re-inserts a fork-deleted
    // key the source updated
    val fc3 = new VersionedTable(spark, s"$root/f3/tables/corpus")
    fc3.delete(col("id") === 1L)
    fk3.commitAtRetrying("fork_del",
      Seq(("corpus", s"$root/f3/tables/corpus", fc3.latestVersion.get)))
    corpus.update(col("id") === 1L, Map("n" -> lit(11L)))
    txn.commit("src_fix", Seq(("corpus", corpus, corpus.latestVersion.get)))
    val t4 = fk3.rebase(txn, keys, policy = "theirs")
    assert(fk3.readAt(t4, "corpus").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
      === Map(1L -> 11L, 2L -> 21L, 4L -> 40L),
      "theirs must re-insert a fork-deleted key the source updated, " +
        "and apply only the delta since the last sync")
  }

  test("rebase guards: a later member's conflict aborts before ANY member " +
    "merges, and a staged-but-unstamped fork tail blocks the pull") {
    val root = freshRoot("rbguard")
    val a = VersionedTable(spark, s"$root/a")
    val b = VersionedTable(spark, s"$root/b")
    val txn = MultiTableTxn(spark, root)
    val va0 = a.overwrite(Seq((1L, "x", 10L)).toDF("id", "src", "n"))
    val vb0 = b.overwrite(Seq((2L, "y", 20L)).toDF("id", "src", "n"))
    val t0 = txn.commit("bootstrap", Seq(("a", a, va0), ("b", b, vb0)))
    val fork = txn.cloneAt(t0, s"$root/fork")
    // upstream touches BOTH members; the fork conflicts only on 'b'
    a.update(col("id") === 1L, Map("n" -> lit(11L)))
    b.update(col("id") === 2L, Map("n" -> lit(21L)))
    txn.commit("src_load", Seq(("a", a, a.latestVersion.get),
      ("b", b, b.latestVersion.get)))
    val fb = new VersionedTable(spark, s"$root/fork/tables/b")
    fb.update(col("id") === 2L, Map("n" -> lit(22L)))
    fork.commitAtRetrying("fork_load",
      Seq(("b", s"$root/fork/tables/b", fb.latestVersion.get)))
    // policy=fail: 'a' sorts before 'b', but the conflict on 'b' must
    // abort the whole pull BEFORE 'a' merges anything
    val fa = new VersionedTable(spark, s"$root/fork/tables/a")
    val vaBefore = fa.latestVersion
    val e = intercept[IllegalStateException](
      fork.rebase(txn, _ => Seq("id")))
    assert(e.getMessage.contains("'b'"), e.getMessage)
    assert(fa.latestVersion === vaBefore,
      "a conflict on a later member must commit NOTHING on earlier ones")
    // ours: the pull lands — 'a' takes the upstream fix, 'b' keeps ours
    val tr = fork.rebase(txn, _ => Seq("id"), policy = "ours")
    assert(fork.readAt(tr, "a").head().getLong(2) === 11L)
    assert(fork.readAt(tr, "b").head().getLong(2) === 22L)
    // staged-but-unstamped tail on a member blocks the next pull: the
    // merge must land on the stamped pin, never a crashed writer's tail
    a.update(col("id") === 1L, Map("n" -> lit(12L)))
    txn.commit("src_fix", Seq(("a", a, a.latestVersion.get)))
    fa.append(Seq((9L, "zz", 90L)).toDF("id", "src", "n")) // unstamped
    val e2 = intercept[IllegalArgumentException](
      fork.rebase(txn, _ => Seq("id"), policy = "ours"))
    assert(e2.getMessage.contains("staged-but-unstamped"), e2.getMessage)
  }

  test("cloneAt with a SHARDED member clones at the pinned coordinator " +
    "snapshot — post-snapshot partitions excluded, old member versions " +
    "replayed") {
    import graft.sources.PartitionedVersionedTable
    val root = freshRoot("forkshard")
    val events = PartitionedVersionedTable(spark, s"$root/events", "src")
    val txn = MultiTableTxn(spark, root)
    val s0 = events.overwrite(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "src", "n"))
    val t0 = txn.commitAt("bootstrap", Seq(("events", s"$root/events", s0)))
    // the source moves on: partition b grows AND a brand-new partition c
    // appears, stamped at t1 — the fork at t0 must see neither
    events.append(Seq((3L, "b", 30L), (4L, "c", 40L)).toDF("id", "src", "n"))
    txn.commitAt("load", Seq(("events", s"$root/events",
      events.latestSnapshot.get)))

    val fork = txn.cloneAt(t0, s"$root/fork")
    val got = fork.readAt(0L, "events")
    assert(got.count() === 2L,
      "fork must replay the pinned snapshot, not the members' latest")
    assert(got.select("src").distinct().collect().map(_.getString(0)).toSet
      === Set("a", "b"), "post-snapshot partition leaked into the fork")
    val pvtFork = new PartitionedVersionedTable(
      spark, s"$root/fork/tables/events", "src")
    assert(pvtFork.partitions.toSet === Set("a", "b"),
      "a partition created after the pinned snapshot must not be cloned")
    // the fork is a real sharded table: a cross-partition write commits
    // its own coordinator snapshot without touching the source
    pvtFork.append(Seq((9L, "a", 90L)).toDF("id", "src", "n"))
    assert(pvtFork.read().count() === 3L)
    assert(txn.readAt(t0, "events").count() === 2L)
  }
}
