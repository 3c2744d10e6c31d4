package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL `CALL` maintenance procedures on the graft catalog. */
class GraftProceduresSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_proc_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gproc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gproc.warehouse", w)
    w
  }

  private def seeded(name: String): VersionedTable = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS gproc.$name")
    spark.sql(s"CREATE TABLE gproc.$name (id BIGINT, v STRING) USING graft")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gproc.$name VALUES (${i * 2}, 'a'), (${i * 2 + 1}, 'b')")
    }
    VersionedTable(spark, s"$warehouse/$name")
  }

  test("CALL compact merges the append deltas into one dir") {
    val vt = seeded("t_comp")
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs.size > 1)
    val out = spark.sql("CALL gproc.compact(tbl => 't_comp')").collect()
    assert(out.length === 1 && out.head.getLong(0) === vt.latestVersion.get)
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs.size === 1)
    assert(spark.sql("SELECT count(*) FROM gproc.t_comp").head.getLong(0) === 8)
  }

  test("CALL optimize clusters; CALL vacuum trims history") {
    val vt = seeded("t_opt")
    spark.sql("CALL gproc.optimize(tbl => 't_opt', cluster_by => 'id', n_chunks => 4)")
    assert(vt.manifestOf(vt.latestVersion.get).operation === "compact_clustered")
    assert(spark.sql("SELECT sum(id) FROM gproc.t_opt").head.getLong(0) === (0 until 8).sum)
    val before = vt.versions.size
    val out = spark.sql("CALL gproc.vacuum(tbl => 't_opt', keep_versions => 2)").collect()
    assert(out.head.getLong(0) === 2L && before > 2)
    assert(vt.versions.size === 2)
  }

  test("CALL compact_bucketed rewrites the snapshot into one bucketed dir, " +
    "content untouched") {
    val vt = seeded("t_bkt")
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs.size > 1)
    val before = spark.sql("SELECT * FROM gproc.t_bkt").collect()
      .map(_.toSeq).toSet
    val out = spark.sql(
      "CALL gproc.compact_bucketed(tbl => 't_bkt', bucket_by => 'id', " +
        "n_buckets => 4)").collect()
    assert(out.length === 1 && out.head.getLong(0) === vt.latestVersion.get)
    val v = vt.latestVersion.get
    assert(vt.manifestOf(v).operation === "overwrite_bucketed")
    assert(vt.manifestOf(v).dataDirs.size === 1)
    assert(vt.bucketSpecOf(v).exists { case (n, b, s, _) =>
      n == 4 && b == Seq("id") && s == Seq("id") })
    // same rows through BOTH read paths (catalog DSv2 scan + the
    // planner-visible bucketed registration)
    assert(spark.sql("SELECT * FROM gproc.t_bkt").collect()
      .map(_.toSeq).toSet === before)
    assert(vt.readBucketed().collect().map(_.toSeq).toSet === before)
    // partitioned tables decline loudly
    val e = intercept[Exception] {
      spark.sql("DROP TABLE IF EXISTS gproc.t_bktp")
      spark.sql("CREATE TABLE gproc.t_bktp (id BIGINT, v STRING) " +
        "USING graft PARTITIONED BY (v)")
      spark.sql("INSERT INTO gproc.t_bktp VALUES (1, 'a')")
      spark.sql("CALL gproc.compact_bucketed(tbl => 't_bktp', bucket_by => 'id')")
    }
    assert(e.getMessage.contains("flat tables"), e.getMessage)
  }

  test("CALL compact_small is a no-op above the threshold") {
    val vt = seeded("t_small")
    val out = spark.sql("CALL gproc.compact_small(tbl => 't_small', min_rows => 1)").collect()
    assert(out.head.isNullAt(0), "all dirs above min_rows: expected null version")
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs.size > 1)
    val out2 = spark.sql("CALL gproc.compact_small(tbl => 't_small', min_rows => 100)").collect()
    assert(!out2.head.isNullAt(0))
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs.size === 1)
  }

  test("CALL history and scan_report expose the table's observability") {
    val vt = seeded("t_obs")
    val hist = spark.sql("CALL gproc.history(tbl => 't_obs')").collect()
    assert(hist.length === vt.versions.size)
    assert(hist.head.getLong(0) === vt.latestVersion.get) // newest first
    assert(hist.map(_.getString(1)).toSet === Set("overwrite", "append"))
    // stats-tracked table (API handle in the same warehouse): the report
    // must show exactly one dir opened for a band-local predicate
    import spark.implicits._
    val vt2 = graft.sources.VersionedTable(spark, s"$warehouse/t_rep",
      statsCols = Seq("id"))
    (0 until 4).foreach { d =>
      val band = Seq((d * 2L, "a"), (d * 2L + 1, "b")).toDF("id", "v")
      if (d == 0) vt2.overwrite(band) else vt2.append(band)
    }
    val rep = spark.sql(
      "CALL gproc.scan_report(tbl => 't_rep', predicate => 'id >= 6')")
      .collect()
    assert(rep.length === 4)
    assert(rep.count(_.getBoolean(1)) === 1,
      rep.map(r => (r.getString(0), r.getBoolean(1))).mkString(", "))
    // DESCRIBE-DETAIL analogue: one row with the latest snapshot's facts
    val det = spark.sql("CALL gproc.detail(tbl => 't_obs')").collect()
    assert(det.length === 1)
    assert(det.head.getLong(0) === vt.latestVersion.get)
    assert(det.head.getLong(4) === 8L)   // num_rows from the ledger
    assert(det.head.getLong(5) > 0L)     // size_bytes from the FS walk
  }

  test("CALL restore rolls back metadata-only; CALL clone hands out a zero-copy twin") {
    val vt = seeded("t_rest")
    val before = spark.sql("SELECT sum(id) FROM gproc.t_rest").head.getLong(0)
    val v1 = vt.versions(1) // after the first insert: ids 0, 1
    spark.sql("DELETE FROM gproc.t_rest WHERE id >= 2")
    assert(spark.sql("SELECT count(*) FROM gproc.t_rest").head.getLong(0) === 2)
    val out = spark.sql(
      s"CALL gproc.restore(tbl => 't_rest', version => ${vt.versions.last - 1})")
    // restore to the pre-delete version: content back, history intact
    spark.sql(s"CALL gproc.restore(tbl => 't_rest', version => $v1)")
    assert(spark.sql("SELECT count(*) FROM gproc.t_rest").head.getLong(0) === 2)
    spark.sql(s"CALL gproc.restore(tbl => 't_rest', version => ${v1 + 3})")
    assert(spark.sql("SELECT sum(id) FROM gproc.t_rest").head.getLong(0) === before)
    assert(vt.manifestOf(vt.latestVersion.get).operation === "restore")
    assert(out.collect().length === 1)

    spark.sql("CALL gproc.clone(tbl => 't_rest', dest => 't_rest_c')")
    assert(spark.sql("SELECT sum(id) FROM gproc.t_rest_c").head.getLong(0) === before)
    val clone = VersionedTable(spark, s"$warehouse/t_rest_c")
    assert(clone.manifestOf(0L).operation === "clone")
    // zero-copy: the clone's dirs are fully-qualified refs into the source
    assert(clone.manifestOf(0L).dataDirs.forall(_.contains("/t_rest/")))
    // writes on the clone stay copy-on-write under the clone's root
    spark.sql("INSERT INTO gproc.t_rest_c VALUES (99, 'z')")
    assert(spark.sql("SELECT count(*) FROM gproc.t_rest_c").head.getLong(0) === 9)
    assert(spark.sql("SELECT count(*) FROM gproc.t_rest").head.getLong(0) === 8)
    spark.sql("DROP TABLE gproc.t_rest_c")
    assert(spark.sql("SELECT count(*) FROM gproc.t_rest").head.getLong(0) === 8)
  }

  test("CALL clone carries the stats_cols sidecar to the destination") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gproc.t_sc")
    spark.sql("DROP TABLE IF EXISTS gproc.t_sc_c")
    spark.sql("CREATE TABLE gproc.t_sc (id BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('stats_cols' = 'id')")
    spark.sql("INSERT INTO gproc.t_sc VALUES (1, 'a'), (2, 'b')")
    spark.sql("CALL gproc.clone(tbl => 't_sc', dest => 't_sc_c')")
    // a LATER catalog write on the clone must keep recording ledgers —
    // observable as the metadata-only min/max still answering post-insert
    spark.sql("INSERT INTO gproc.t_sc_c VALUES (99, 'z')")
    val agg = spark.sql("SELECT min(id), max(id) FROM gproc.t_sc_c")
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 99L)))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "the clone's post-insert ledgers must stay metadata-exact:\n" +
        agg.queryExecution.executedPlan.toString)
    spark.sql("DROP TABLE gproc.t_sc_c")
    spark.sql("DROP TABLE gproc.t_sc")
  }

  test("CALL txn_commit/vector/history/vacuum: the manifest as SQL text") {
    val tc = seeded("t_txn_c") // 5 commits: create + 4 inserts
    val ts = seeded("t_txn_s")
    val vc0 = tc.latestVersion.get
    val vs0 = ts.latestVersion.get
    // stamp txn 0 over both tables' current versions
    val t0 = spark.sql("CALL gproc.txn_commit(log => 'txn_log', " +
      s"op => 'bootstrap', tbls => 't_txn_c,t_txn_s', " +
      s"versions => '$vc0,$vs0')").head.getLong(0)
    assert(t0 === 0L)
    // stage a new commit on ONE table; stamp txn 1 with only it — the
    // other carries forward at its PINNED version
    spark.sql("INSERT INTO gproc.t_txn_c VALUES (100, 'z')")
    val vc1 = tc.latestVersion.get
    val t1 = spark.sql("CALL gproc.txn_commit(log => 'txn_log', " +
      s"op => 'daily', tbls => 't_txn_c', versions => '$vc1')")
      .head.getLong(0)
    assert(t1 === 1L)
    val vec = spark.sql(s"CALL gproc.txn_vector(log => 'txn_log', txn => $t1)")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(vec === Map("t_txn_c" -> vc1, "t_txn_s" -> vs0))
    // the composable consistent read: pinned version via VERSION AS OF
    assert(spark.sql(
      s"SELECT count(*) FROM gproc.t_txn_c VERSION AS OF ${vec("t_txn_c")}")
      .head.getLong(0) === 9L)
    assert(spark.sql(
      s"SELECT count(*) FROM gproc.t_txn_s VERSION AS OF ${vec("t_txn_s")}")
      .head.getLong(0) === 8L)
    val hist = spark.sql("CALL gproc.txn_history(log => 'txn_log')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    assert(hist.toSeq === Seq((1L, "daily", 2), (0L, "bootstrap", 2)))
    // txn-aware vacuum: keep 1 → txn 0 gone, member versions pinned by
    // txn 1 survive the member vacuum
    val live = spark.sql(
      "CALL gproc.txn_vacuum(log => 'txn_log', keep_txns => 1)")
      .head.getLong(0)
    assert(live === 1L)
    assert(tc.versions.contains(vc1) && ts.versions.contains(vs0))
    // mismatched pairing rejects loudly
    val e = intercept[Exception] {
      spark.sql("CALL gproc.txn_commit(log => 'txn_log', op => 'x', " +
        "tbls => 't_txn_c,t_txn_s', versions => '1')").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("pair up")), e.toString)
  }

  test("CALL txn_clone: fork the manifest from SQL text at a non-latest pin") {
    val tc = seeded("t_fork_a") // 5 commits, 8 rows
    val vc0 = tc.latestVersion.get
    val t0 = spark.sql("CALL gproc.txn_commit(log => 'fork_log', " +
      s"op => 'bootstrap', tbls => 't_fork_a', versions => '$vc0')")
      .head.getLong(0)
    // the source moves past the fork point
    spark.sql("INSERT INTO gproc.t_fork_a VALUES (100, 'z')")
    spark.sql("CALL gproc.txn_commit(log => 'fork_log', op => 'later', " +
      s"tbls => 't_fork_a', versions => '${tc.latestVersion.get}')")
    val dest = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_proc_fork_${spark.sparkContext.applicationId}"
    val dp = new org.apache.hadoop.fs.Path(dest)
    val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dp)) fs.delete(dp, true)
    val rows = spark.sql(s"CALL gproc.txn_clone(log => 'fork_log', " +
      s"txn => $t0, dest_log => '$dest')").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("t_fork_a", 0L)))
    assert(rows.head.getString(1) === s"$dest/tables/t_fork_a")
    // the fork replays the PINNED (pre-insert) state, not the latest
    val fork = graft.sources.MultiTableTxn(spark, dest)
    assert(fork.readAt(0L, "t_fork_a").count() === 8L)
    assert(tc.read().count() === 9L)
    // CALL txn_as_of resolves a wall-clock instant to the newest stamp
    val nowTxn = spark.sql("CALL gproc.txn_as_of(log => 'fork_log', " +
      s"ts_ms => ${System.currentTimeMillis()})").head.getLong(0)
    assert(nowTxn === 1L)
    // CALL txn_materialize localizes the fork's foreign refs and stamps
    val stamped = spark.sql(s"CALL gproc.txn_materialize(log => '$dest', " +
      "txn => 0)").head.getLong(0)
    assert(stamped === 1L)
    assert(fork.detail(stamped)._1 === "txn_materialize:0")
    assert(fork.readAt(stamped, "t_fork_a").count() === 8L)
    // CALL txn_rebase pulls the source's post-fork insert onto the fork
    // (the fork's own materialize rewrote no rows, so no conflicts)
    val tr = spark.sql(s"CALL gproc.txn_rebase(log => '$dest', " +
      "source_log => 'fork_log', key_cols => 'id')").head.getLong(0)
    assert(fork.detail(tr)._1.startsWith("txn_rebase:"))
    assert(fork.readAt(tr, "t_fork_a").count() === 9L,
      "the source's post-fork insert must land on the fork")
  }

  test("unknown procedure and unknown table fail cleanly") {
    seeded("t_err")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception] { spark.sql("CALL gproc.frobnicate('t_err')") }
    assert(msgs(e1).exists(_.contains("no procedure")), e1.toString)
    val e2 = intercept[Exception] {
      spark.sql("CALL gproc.compact(tbl => 'no_such_table')").collect()
    }
    assert(msgs(e2).exists(m => m.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      m.toLowerCase.contains("not found") || m.contains("no_such_table")), e2.toString)
  }

  test("CALL export_delta / export_iceberg hand the table to foreign-runtime layouts") {
    val vt = seeded("t_exp")
    val dd = java.nio.file.Files.createTempDirectory("proc_dlx").toString
    val di = java.nio.file.Files.createTempDirectory("proc_ice").toString
    val n = spark.sql(s"CALL gproc.export_delta(tbl => 't_exp', dest => '$dd')")
      .head.getLong(0)
    assert(n === vt.versions.size.toLong)
    assert(new java.io.File(s"$dd/_delta_log").listFiles()
      .count(_.getName.endsWith(".json")) === vt.versions.size)
    val m = spark.sql(s"CALL gproc.export_iceberg(tbl => 't_exp', dest => '$di')")
      .head.getLong(0)
    assert(m === vt.versions.size.toLong)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$di/metadata/version-hint.text"))
      .trim.toInt === vt.versions.size)
  }
}
