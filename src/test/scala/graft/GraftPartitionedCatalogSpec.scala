package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftPartitionedScan, PartitionedVersionedTable, VersionedTable}

/** `CREATE TABLE ... USING graft PARTITIONED BY (col)` — the per-
  * partition-log layout ([[PartitionedVersionedTable]]) reachable from
  * SQL text: DDL, INSERT, pruned SELECT, UPDATE / DELETE / MERGE INTO,
  * ALTER, snapshot time travel, DROP.
  */
class GraftPartitionedCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_pcat_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gpart", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpart.warehouse", w)
    w
  }

  private def freshTable(name: String): PartitionedVersionedTable = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS gpart.$name")
    spark.sql(s"CREATE TABLE gpart.$name (id BIGINT, repo STRING, n BIGINT) " +
      "USING graft PARTITIONED BY (repo)")
    spark.sql(s"INSERT INTO gpart.$name VALUES " +
      "(1, 'alpha', 10), (2, 'alpha', 20), (3, 'beta', 30), (4, 'gamma', 40)")
    PartitionedVersionedTable(spark, s"$warehouse/$name", "repo")
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[GraftPartitionedScan] = {
    df.collect() // materialize so AQE finalizes
    graft.plans.PlanScans.batchScans(df.queryExecution.executedPlan)
      .map(_.scan).collect { case s: GraftPartitionedScan => s }
  }

  test("create lays out per-partition logs; WHERE repo='x' opens ONE of them") {
    val pvt = freshTable("t1")
    assert(pvt.partitions === Seq("alpha", "beta", "gamma"))
    // each partition value is its own governed table
    assert(VersionedTable(spark, s"$warehouse/t1/repo=alpha").versions.nonEmpty)

    val q = spark.sql("SELECT id, n FROM gpart.t1 WHERE repo = 'beta'")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 30L)))
    val scans = scansOf(q)
    assert(scans.nonEmpty, "expected the delegated partitioned scan")
    assert(scans.head.keptPartitions === Seq("beta"),
      "partition pruning must open exactly one partition log")
    // and the delegated parquet scan's file index holds only that
    // partition's dirs (inputFiles is a V1-relation affordance)
    val desc = scans.head.delegate.description()
    assert(desc.contains("repo=beta") && !desc.contains("repo=alpha"), desc)

    // unfiltered: all partitions, exact ledger row count feeds the planner
    val all = spark.sql("SELECT * FROM gpart.t1")
    assert(all.count() === 4)
    assert(scansOf(all).head.keptPartitions === Seq("alpha", "beta", "gamma"))
  }

  test("INSERT INTO appends only to touched logs; OVERWRITE is whole-table") {
    val pvt = freshTable("t2")
    val betaVersionsBefore = pvt.partition("beta").versions.size
    spark.sql("INSERT INTO gpart.t2 VALUES (5, 'alpha', 50)")
    assert(pvt.partition("beta").versions.size === betaVersionsBefore,
      "untouched partition log must not gain a version")
    assert(spark.sql("SELECT count(*) FROM gpart.t2").head.getLong(0) === 5)

    spark.sql("INSERT OVERWRITE gpart.t2 VALUES (9, 'beta', 90)")
    assert(spark.sql("SELECT * FROM gpart.t2").collect().map(_.getLong(0)).toSeq === Seq(9L))
    // history survives per partition: the pre-overwrite alpha rows time-travel
    assert(pvt.partition("alpha").readVersion(
      pvt.partition("alpha").versions.takeRight(2).head).count() === 3)
  }

  test("UPDATE / DELETE prune their partition sweep") {
    val pvt = freshTable("t3")
    val gammaBefore = pvt.partition("gamma").versions.size
    spark.sql("UPDATE gpart.t3 SET n = n + 1 WHERE repo = 'alpha' AND id = 1")
    assert(spark.sql("SELECT n FROM gpart.t3 WHERE id = 1").head.getLong(0) === 11L)
    assert(pvt.partition("gamma").versions.size === gammaBefore,
      "UPDATE bounded to repo='alpha' must not open the gamma log")

    spark.sql("DELETE FROM gpart.t3 WHERE repo = 'beta'")
    assert(spark.sql("SELECT count(*) FROM gpart.t3").head.getLong(0) === 3)
    assert(pvt.partition("gamma").versions.size === gammaBefore,
      "DELETE bounded to repo='beta' must not open the gamma log")

    // a predicate excluding EVERY partition is a complete no-op — no log
    // may gain a version (an empty hint must not degrade to a full sweep)
    val versBefore = pvt.partitions.map(v => v -> pvt.partition(v).versions.size)
    spark.sql("DELETE FROM gpart.t3 WHERE repo = 'zeta'")
    spark.sql("UPDATE gpart.t3 SET n = 0 WHERE repo = 'zeta'")
    assert(pvt.partitions.map(v => v -> pvt.partition(v).versions.size) ===
      versBefore, "out-of-domain DELETE/UPDATE must not open any log")

    // UPDATE of the partition column is rejected (rows cannot move logs)
    val e = intercept[Exception] {
      spark.sql("UPDATE gpart.t3 SET repo = 'zeta' WHERE id = 1")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("partition column")), e.toString)
  }

  test("MERGE INTO routes arms through per-partition logs") {
    val pvt = freshTable("t4")
    import spark.implicits._
    Seq((2L, "alpha", 200L), (7L, "delta", 700L))
      .toDF("sid", "srepo", "sn").createOrReplaceTempView("p_src")
    val gammaBefore = pvt.partition("gamma").versions.size
    spark.sql("""MERGE INTO gpart.t4 t USING p_src s
                |ON t.repo = s.srepo AND t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |WHEN NOT MATCHED THEN INSERT (id, repo, n) VALUES (s.sid, s.srepo, s.sn)
                |""".stripMargin)
    val rows = spark.sql("SELECT id, repo, n FROM gpart.t4 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows === Array((1L, "alpha", 10L), (2L, "alpha", 200L),
      (3L, "beta", 30L), (4L, "gamma", 40L), (7L, "delta", 700L)))
    // a brand-new partition value created its own log; untouched logs idle
    assert(pvt.partitions.contains("delta"))
    assert(pvt.partition("gamma").versions.size === gammaBefore,
      "merge touching alpha+delta must not open the gamma log")

    // a merge with NO insert arm must not litter an empty log for a
    // source-only partition value
    Seq((1L, "omega", 1L)).toDF("sid", "srepo", "sn")
      .createOrReplaceTempView("p_src_noins")
    spark.sql("""MERGE INTO gpart.t4 t USING p_src_noins s
                |ON t.repo = s.srepo AND t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |""".stripMargin)
    assert(!pvt.partitions.contains("omega"),
      "insert-less merge must not create a partition log")

    // without the partition-equality conjunct the merge routes through
    // the GLOBAL probe pass — same rows, and only matched logs advance
    val betaV = pvt.partition("beta").versions.size
    val gammaV = pvt.partition("gamma").versions.size
    spark.sql("""MERGE INTO gpart.t4 t USING p_src s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |""".stripMargin)
    val rows2 = spark.sql("SELECT id, n FROM gpart.t4 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows2 === Array((1L, 10L), (2L, 200L), (3L, 30L), (4L, 40L),
      (7L, 700L)))
    assert(pvt.partition("beta").versions.size === betaV,
      "global merge matching alpha+delta must not open the beta log")
    assert(pvt.partition("gamma").versions.size === gammaV)
  }

  test("global MERGE (ON t.id = s.id) touches only the logs holding matches") {
    val pvt = freshTable("t18") // alpha={1,2} beta={3} gamma={4}
    spark.sql("INSERT INTO gpart.t18 VALUES (5, 'delta', 50)") // 4th log
    import spark.implicits._
    Seq((2L, 2000L), (3L, 3000L), (9L, 9000L))
      .toDF("sid", "sn").createOrReplaceTempView("p_gsrc")
    val gammaV = pvt.partition("gamma").versions.size
    val deltaV = pvt.partition("delta").versions.size
    spark.sql("""MERGE INTO gpart.t18 t USING p_gsrc s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                |  VALUES (s.sid, 'omega', s.sn)
                |""".stripMargin)
    val rows = spark.sql("SELECT id, repo, n FROM gpart.t18 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows === Array((1L, "alpha", 10L), (2L, "alpha", 2000L),
      (3L, "beta", 3000L), (4L, "gamma", 40L), (5L, "delta", 50L),
      (9L, "omega", 9000L)))
    // routing derived from the probe: 2 of 4 existing logs advanced
    // (alpha, beta), the unmatched insert created omega, and the two
    // match-less logs were never opened
    assert(pvt.partition("gamma").versions.size === gammaV)
    assert(pvt.partition("delta").versions.size === deltaV)
    assert(pvt.partitions.contains("omega"))

    // the ON-key-rewrite + INSERT corner rejects loudly (the sequential
    // matched/insert passes would re-evaluate ON against post-update rows)
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gpart.t18 t USING p_gsrc s ON t.id = s.sid
                  |WHEN MATCHED THEN UPDATE SET id = s.sid + 100
                  |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                  |  VALUES (s.sid, 'omega', s.sn)
                  |""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("ON-referenced")), e.toString)
  }

  test("global MERGE guards: NMBS key-rewrite, duplicate sources, routing cap") {
    val pvt = freshTable("t18b")
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))

    // a NOT MATCHED BY SOURCE UPDATE rewriting an ON-referenced column
    // runs in the same first pass as MATCHED arms — combined with an
    // INSERT arm it poisons the insert pass's ON re-evaluation exactly
    // like the MATCHED variant, so the guard must catch it too
    Seq((2L, 2000L)).toDF("sid", "sn").createOrReplaceTempView("p_g1")
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO gpart.t18b t USING p_g1 s ON t.id = s.sid
                  |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                  |  VALUES (s.sid, 'omega', s.sn)
                  |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET id = t.id + 100
                  |""".stripMargin)
    }
    assert(msgs(e1).exists(_.contains("ON-referenced")), e1.toString)

    // IDENTICAL duplicate source rows that match a target are the same
    // cardinality violation the partition-conjunct fast path raises —
    // the routing dedup must not silently accept them
    Seq((2L, 2000L), (2L, 2000L)).toDF("sid", "sn")
      .createOrReplaceTempView("p_g2")
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO gpart.t18b t USING p_g2 s ON t.id = s.sid
                  |WHEN MATCHED THEN UPDATE SET n = s.sn
                  |""".stripMargin)
    }
    assert(msgs(e2).exists(_.contains("cardinality")), e2.toString)
    // ...but with NO matched clauses there is nothing ambiguous to apply
    // — flat MERGE dedups instead of raising, and so must the global
    // path. This is ALSO the insert-if-absent idiom's latent-crash case:
    // the matched pass must not hand the member merge zero clauses, and
    // matched members must not even commit a no-op version
    val alphaV = pvt.partition("alpha").versions.size
    spark.sql("""MERGE INTO gpart.t18b t USING p_g2 s ON t.id = s.sid
                |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                |  VALUES (s.sid, 'omega', s.sn)
                |""".stripMargin) // id=2 exists: matched rows no-op quietly
    assert(pvt.partition("alpha").versions.size === alphaV,
      "insert-only merge must not commit versions in matched members")
    assert(spark.sql("SELECT n FROM gpart.t18b WHERE id = 2")
      .head().getLong(0) === 20L, "matched row must be untouched")
    // ...while duplicates that match NOTHING insert row-per-row, as flat
    Seq((70L, 700L), (70L, 700L)).toDF("sid", "sn")
      .createOrReplaceTempView("p_g3")
    spark.sql("""MERGE INTO gpart.t18b t USING p_g3 s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                |  VALUES (s.sid, 'omega', s.sn)
                |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gpart.t18b WHERE id = 70")
      .head().getLong(0) === 2L)

    // a data-sized partition routing rejects loudly, naming the conf
    spark.conf.set(PartitionedVersionedTable.MaxRouteValuesConf, "2")
    try {
      val e3 = intercept[Exception] {
        pvt.mergeIntoGlobal(
          Seq((101L, "r1", 1L), (102L, "r2", 2L), (103L, "r3", 3L))
            .toDF("sid", "srepo", "sn"),
          expr("id = sid"),
          notMatched = Seq(VersionedTable.MergeIntoInsert(None, Map(
            "id" -> col("sid"), "repo" -> col("srepo"), "n" -> col("sn")))))
      }
      assert(msgs(e3).exists(_.contains(
        PartitionedVersionedTable.MaxRouteValuesConf)), e3.toString)
    } finally spark.conf.unset(PartitionedVersionedTable.MaxRouteValuesConf)
  }

  test("global MERGE bootstraps an EMPTY partitioned table via its INSERT arm") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpart.t19")
    spark.sql("CREATE TABLE gpart.t19 (id BIGINT, repo STRING, n BIGINT) " +
      "USING graft PARTITIONED BY (repo)")
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("sid", "srepo", "sn").createOrReplaceTempView("p_boot")
    // zero partitions exist: there is nothing to probe — every source row
    // routes straight to its INSERT arm's partition value
    spark.sql("""MERGE INTO gpart.t19 t USING p_boot s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET n = s.sn
                |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                |  VALUES (s.sid, s.srepo, s.sn)
                |""".stripMargin)
    val rows = spark.sql("SELECT id, repo, n FROM gpart.t19 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows === Array((1L, "a", 10L), (2L, "b", 20L)))

    // an arm that FIRES with a NULL partition value raises — never a
    // silent row drop (the fast path's validate(null) contract)
    Seq((9L, null.asInstanceOf[String], 90L))
      .toDF("sid", "srepo", "sn").createOrReplaceTempView("p_bootnull")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gpart.t19 t USING p_bootnull s ON t.id = s.sid
                  |WHEN NOT MATCHED THEN INSERT (id, repo, n)
                  |  VALUES (s.sid, s.srepo, s.sn)
                  |""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("NULL")), e.toString)
  }

  test("metadata-only aggregates answer from summed member ledgers") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpart.t7")
    spark.sql("CREATE TABLE gpart.t7 (id BIGINT, repo STRING, n BIGINT) " +
      "USING graft PARTITIONED BY (repo) " +
      "TBLPROPERTIES ('stats_cols' = 'id,n')")
    spark.sql("INSERT INTO gpart.t7 VALUES " +
      "(1, 'alpha', 10), (2, 'alpha', 20), (3, 'beta', 30), (4, 'gamma', 40)")
    val agg = spark.sql(
      "SELECT count(*) AS c, count(n) AS cn, min(id) AS mi, max(n) AS mx " +
        "FROM gpart.t7")
    val row = agg.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ===
      ((4L, 4L, 1L, 40L)))
    // the answer is a driver-local one-row scan: zero member data files
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      agg.queryExecution.executedPlan.toString)
    // a filter declines the pushdown but stays correct
    val filtered = spark.sql(
      "SELECT count(*) FROM gpart.t7 WHERE repo = 'alpha'")
    assert(filtered.head.getLong(0) === 2L)
    assert(!filtered.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("pushed LIMIT bounds the member-dir prefix; later logs stay unopened") {
    freshTable("t9")
    val df = spark.sql("SELECT * FROM gpart.t9 LIMIT 2")
    assert(df.collect().length === 2)
    val scans = scansOf(df)
    assert(scans.nonEmpty, "no partitioned scan under the limit")
    assert(scans.head.description().contains("PushedLimit: 2"),
      scans.head.description())
    val opened = scans.head.delegate
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .fileIndex.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
      .distinct
    assert(opened.length === 1 && opened.head.contains("repo=alpha"),
      s"LIMIT 2 over alpha's 2-row dir must open exactly it: ${opened.toSeq}")
  }

  test("SHOW TBLPROPERTIES surfaces the layout facts") {
    freshTable("t11")
    val props = spark.sql("SHOW TBLPROPERTIES gpart.t11").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // `provider` is Spark-reserved (hidden from SHOW); the layout facts show
    assert(props.get("partition_col").contains("repo"), props.toString)
    assert(props.contains("latest_snapshot"), props.toString)
    spark.sql("DROP TABLE IF EXISTS gpart.t12")
    spark.sql("CREATE TABLE gpart.t12 (id BIGINT, repo STRING) USING graft " +
      "PARTITIONED BY (repo) TBLPROPERTIES ('stats_cols' = 'id')")
    val p12 = spark.sql("SHOW TBLPROPERTIES gpart.t12").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(p12.get("stats_cols").contains("id"), p12.toString)
    spark.sql("DROP TABLE gpart.t12")
  }

  test("CALL partitions lists values with ledger row counts") {
    freshTable("t8")
    val rows = spark.sql("CALL gpart.partitions(tbl => 't8')").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSet ===
      Set(("alpha", 2L), ("beta", 1L), ("gamma", 1L)))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      spark.sql("CALL gpart.partitions(tbl => 'no_such')").collect()
    }
    assert(msgs(e).exists(_.contains("not a partitioned graft table")), e.toString)
  }

  test("CALL compact/vacuum/history run per-partition-log; flat-only procedures reject") {
    val pvt = freshTable("t10")
    (0 until 3).foreach(i =>
      spark.sql(s"INSERT INTO gpart.t10 VALUES (${100 + i}, 'alpha', $i)"))
    assert(pvt.partition("alpha").manifestOf(
      pvt.partition("alpha").latestVersion.get).dataDirs.size > 1)
    spark.sql("CALL gpart.compact(tbl => 't10')")
    assert(pvt.partition("alpha").manifestOf(
      pvt.partition("alpha").latestVersion.get).dataDirs.size === 1,
      "compact must merge alpha's delta dirs")
    assert(spark.sql("SELECT count(*) FROM gpart.t10").head.getLong(0) === 7)

    val hist = spark.sql("CALL gpart.history(tbl => 't10')").collect()
    assert(hist.nonEmpty && hist.head.getString(1) === "compact",
      hist.map(_.toString).mkString(", "))
    assert(hist.map(_.getLong(0)).toSeq ===
      hist.map(_.getLong(0)).toSeq.sorted.reverse, "history is newest-first")

    // in-partition clustering: partition by repo, cluster by id within
    spark.sql("CALL gpart.optimize(tbl => 't10', cluster_by => 'id', n_chunks => 2)")
    assert(pvt.partition("alpha").manifestOf(
      pvt.partition("alpha").latestVersion.get).operation === "compact_clustered")
    assert(spark.sql("SELECT count(*) FROM gpart.t10").head.getLong(0) === 7)
    intercept[Exception] { // the partition column cannot be a cluster key
      spark.sql("CALL gpart.optimize(tbl => 't10', cluster_by => 'repo')")
    }

    val live = spark.sql("CALL gpart.vacuum(tbl => 't10', keep_versions => 1)")
      .head.getLong(0)
    assert(live === 1L, s"vacuum must keep 1 snapshot, reported $live")
    assert(spark.sql("SELECT count(*) FROM gpart.t10").head.getLong(0) === 7)

    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      spark.sql("CALL gpart.compact_small(tbl => 't10', min_rows => 10)").collect()
    }
    assert(msgs(e).exists(_.contains("does not support partitioned")), e.toString)
  }

  test("CALL detail / scan_report aggregate member logs on partitioned tables") {
    val pvt = freshTable("t15")
    spark.sql("INSERT INTO gpart.t15 VALUES (5, 'beta', 50)")
    // detail: identity facts from the latest coordinator snapshot, size
    // facts summed across member manifests/ledgers
    val det = spark.sql("CALL gpart.detail(tbl => 't15')").collect()
    assert(det.length === 1)
    assert(det.head.getLong(0) === pvt.latestSnapshot.get)
    assert(det.head.getInt(3) >= 4, "num_data_dirs sums member dirs")
    assert(det.head.getLong(4) === 5L, "num_rows sums member ledgers")
    assert(det.head.getLong(5) > 0L)
    assert(det.head.getInt(6) === 0)

    // scan_report: partition pruning first — pruned members report ONE
    // unopened row with null ledgers (their logs are never read); the
    // surviving member reports its own dir-grain rows
    val rep = spark.sql(
      "CALL gpart.scan_report(tbl => 't15', predicate => \"repo = 'beta'\")")
      .collect()
    val pruned = rep.filter(!_.getBoolean(1))
    assert(pruned.map(_.getString(0)).toSet === Set("repo=alpha", "repo=gamma"))
    assert(pruned.forall(r => r.isNullAt(2) && r.isNullAt(3) &&
      r.getLong(4) === 0L), rep.map(_.toString).mkString(", "))
    val opened = rep.filter(_.getBoolean(1))
    assert(opened.nonEmpty &&
      opened.forall(_.getString(0).startsWith("repo=beta/")),
      rep.map(_.toString).mkString(", "))
    assert(opened.map(_.getLong(2)).sum === 2L,
      "beta's opened dirs carry its ledger rows")

    // a dir-grain predicate inside the surviving partition still prunes
    // at BOTH grains (member stats dirs stay unopened)
    val rep2 = spark.sql(
      "CALL gpart.scan_report(tbl => 't15', predicate => " +
        "\"repo = 'beta' and id >= 5\")").collect()
    val betaRows = rep2.filter(_.getString(0).startsWith("repo=beta/"))
    assert(betaRows.exists(_.getBoolean(1)))
  }

  test("CTAS into a partitioned layout: the flat->sharded migration path") {
    val pvt = freshTable("t17")
    spark.sql("DROP TABLE IF EXISTS gpart.t17_sharded")
    // re-shard an existing table by a different column in ONE statement
    spark.sql("""CREATE TABLE gpart.t17_sharded USING graft
                |PARTITIONED BY (repo)
                |TBLPROPERTIES ('stats_cols' = 'id')
                |AS SELECT id, repo, n FROM gpart.t17""".stripMargin)
    val dest = PartitionedVersionedTable(
      spark, s"$warehouse/t17_sharded", "repo")
    assert(dest.partitions === Seq("alpha", "beta", "gamma"))
    assert(spark.sql("SELECT id FROM gpart.t17_sharded").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // the new layout prunes: a one-partition probe opens one log
    val q = spark.sql("SELECT id FROM gpart.t17_sharded WHERE repo = 'beta'")
    q.collect()
    val kept = scansOf(q)
    assert(kept.nonEmpty && kept.head.keptPartitions === Seq("beta"))
  }

  test("CALL restore / clone operate on coordinator snapshots at the sharded layout") {
    val pvt = freshTable("t16") // INSERT → snapshot 0
    spark.sql("INSERT INTO gpart.t16 VALUES (9, 'delta', 90)") // new partition
    spark.sql("DELETE FROM gpart.t16 WHERE repo = 'alpha'")
    assert(spark.sql("SELECT count(*) FROM gpart.t16").head.getLong(0) === 3)

    // restore to snapshot 0: alpha's rows come back AND the delta
    // partition — created after the snapshot — is emptied (table state
    // = snapshot state, not a partial rewind)
    spark.sql("CALL gpart.restore(tbl => 't16', version => 0)")
    val ids = spark.sql("SELECT id FROM gpart.t16").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L))
    // history intact: restore is a NEW snapshot on top, not a rewind
    assert(pvt.latestSnapshot.get > 2L)
    // a vacuumed/unknown snapshot id rejects loudly
    intercept[Exception] {
      spark.sql("CALL gpart.restore(tbl => 't16', version => 999)").collect()
    }

    // clone: zero-copy partitioned twin — marker travels, reads equal,
    // pruning still works, writes stay independent
    spark.sql("DROP TABLE IF EXISTS gpart.t16_clone")
    val out = spark.sql(
      "CALL gpart.clone(tbl => 't16', dest => 't16_clone')").collect()
    assert(out.head.getString(0).endsWith("t16_clone"))
    assert(spark.sql("SELECT id FROM gpart.t16_clone").collect()
      .map(_.getLong(0)).sorted.toSeq === ids)
    assert(spark.sql(
      "SELECT count(*) FROM gpart.t16_clone WHERE repo = 'beta'")
      .head.getLong(0) === 1L)
    spark.sql("INSERT INTO gpart.t16_clone VALUES (99, 'beta', 990)")
    assert(spark.sql("SELECT count(*) FROM gpart.t16_clone").head.getLong(0) === 5)
    assert(spark.sql("SELECT count(*) FROM gpart.t16").head.getLong(0) === 4,
      "a clone write must never touch the source")
  }

  test("TIMESTAMP AS OF resolves the coordinator snapshot log; pre-history rejects") {
    val pvt = freshTable("t13") // INSERT → snapshot 0
    val ts0 = pvt.snapshotDetail(0L)._2
    while (System.currentTimeMillis() <= ts0) Thread.sleep(1)
    spark.sql("INSERT INTO gpart.t13 VALUES (5, 'alpha', 50)") // snapshot 1
    val ts1 = pvt.snapshotDetail(1L)._2
    assert(ts1 > ts0)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    def countAsOf(ms: Long): Long = spark.sql(
      s"SELECT count(*) FROM gpart.t13 TIMESTAMP AS OF " +
        s"'${fmt.format(java.time.Instant.ofEpochMilli(ms))}'").head.getLong(0)
    // at snapshot 0's stamp: exactly the first insert's 4 rows; at
    // snapshot 1's stamp (and later): 5 — the newest snapshot ≤ ts wins
    assert(countAsOf(ts0) === 4L)
    assert(countAsOf(ts1) === 5L)
    assert(countAsOf(ts1 + 60000L) === 5L)
    // pre-history: no snapshot at or before the timestamp → reject, never
    // an empty read
    intercept[Exception] { countAsOf(ts0 - 60000L) }
    spark.sql("DROP TABLE gpart.t13")
  }

  test("partition pruning compares bounds in the partition column's type domain") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpart.t14")
    spark.sql("CREATE TABLE gpart.t14 (id BIGINT, bucket INT) USING graft " +
      "PARTITIONED BY (bucket)")
    spark.sql("INSERT INTO gpart.t14 VALUES (1, 9), (2, 10), (3, 2)")
    val pvt = PartitionedVersionedTable(spark, s"$warehouse/t14", "bucket")
    assert(pvt.partitions === Seq("10", "2", "9")) // dir names sort as strings
    // a UTF8 compare would call '10' < '9' and wrongly prune partition 10
    // for bucket >= 9 — the INT domain must keep it
    assert(pvt.partitionsFor(col("bucket") >= 9).sorted === Seq("10", "9"))
    assert(pvt.partitionsFor(col("bucket") < 9) === Seq("2"))
    assert(pvt.partitionsFor(col("bucket") === 10) === Seq("10"))
    assert(pvt.partitionsFor(col("bucket") =!= 2).sorted === Seq("10", "9"))
    // and the rows themselves come back right through SQL
    assert(spark.sql("SELECT id FROM gpart.t14 WHERE bucket >= 9 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val scans = scansOf(spark.sql("SELECT id FROM gpart.t14 WHERE bucket >= 9"))
    assert(scans.head.keptPartitions.sorted === Seq("10", "9"),
      "the scan must open both matching INT partitions")
    spark.sql("DROP TABLE gpart.t14")
  }

  test("ALTER COLUMN TYPE widens metadata-only across partition logs; rejects otherwise") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpart.t15")
    spark.sql("CREATE TABLE gpart.t15 (id BIGINT, repo STRING, n INT) " +
      "USING graft PARTITIONED BY (repo)")
    spark.sql("INSERT INTO gpart.t15 VALUES (1, 'alpha', 10), (2, 'beta', 20)")
    val pvt = PartitionedVersionedTable(spark, s"$warehouse/t15", "repo")
    val dirsBefore = pvt.partitions.map(p =>
      p -> pvt.partition(p).manifestOf(
        pvt.partition(p).latestVersion.get).dataDirs).toMap
    spark.sql("ALTER TABLE gpart.t15 ALTER COLUMN n TYPE BIGINT")
    pvt.partitions.foreach { p =>
      val vt = pvt.partition(p)
      val m = vt.manifestOf(vt.latestVersion.get)
      assert(m.operation === "widen_column" &&
        m.dataDirs === dirsBefore(p),
        s"partition $p: widen must be metadata-only")
      assert(vt.tableSchema.exists(_("n").dataType ===
        org.apache.spark.sql.types.LongType))
    }
    // pre-widen INT32 files read under the widened schema; new BIGINT
    // values land
    spark.sql("INSERT INTO gpart.t15 VALUES (3, 'alpha', 6000000000)")
    assert(spark.sql("SELECT sum(n) FROM gpart.t15").head.getLong(0)
      === 6000000030L)
    intercept[Exception] { // narrowing rejects
      spark.sql("ALTER TABLE gpart.t15 ALTER COLUMN id TYPE INT")
    }
    intercept[Exception] { // cross-domain rejects
      spark.sql("ALTER TABLE gpart.t15 ALTER COLUMN repo TYPE BIGINT")
    }
    spark.sql("DROP TABLE gpart.t15")
  }

  test("a commit between planning and execution cannot corrupt a pushed LIMIT") {
    val pvt = freshTable("t16")
    val df = spark.sql("SELECT * FROM gpart.t16 LIMIT 3")
    // force planning now: pushLimit proves the row ledgers exact and the
    // scan pins the member versions that proof was made against
    df.queryExecution.executedPlan
    // a DV delete commits BETWEEN planning and execution — against the
    // NEW version the bounded file list would cover fewer real rows than
    // promised (and the raw-file delegate cannot apply the DV at all);
    // the pinned scan reads the PLANNED snapshot instead: exactly 3 rows
    // from the pre-delete state (snapshot isolation)
    pvt.delete(col("id") === 1L, useDeletionVectors = true,
      partitionsHint = Seq("alpha"))
    val rows = df.collect()
    assert(rows.length === 3,
      s"LIMIT 3 planned pre-delete returned ${rows.length} rows")
    assert(rows.map(_.getLong(0)).forall(Seq(1L, 2L, 3L, 4L).contains),
      "rows must come from the planned snapshot")
    // a FRESH query (planned after the commit) sees the delete
    assert(spark.sql("SELECT count(*) FROM gpart.t16").head.getLong(0) === 3L)
    spark.sql("DROP TABLE gpart.t16")
  }

  test("snapshot time travel, ALTER, empty create, DROP") {
    val pvt = freshTable("t5")
    val snapAfterInsert = pvt.latestSnapshot.get
    spark.sql("DELETE FROM gpart.t5 WHERE repo = 'alpha'")
    assert(spark.sql("SELECT count(*) FROM gpart.t5").head.getLong(0) === 2)
    assert(spark.sql(
      s"SELECT count(*) FROM gpart.t5 VERSION AS OF $snapAfterInsert")
      .head.getLong(0) === 4, "the pre-delete snapshot must still read")

    spark.sql("ALTER TABLE gpart.t5 RENAME COLUMN n TO m")
    assert(spark.sql("SELECT * FROM gpart.t5").columns.toSeq ===
      Seq("id", "repo", "m"))
    spark.sql("ALTER TABLE gpart.t5 DROP COLUMN m")
    assert(spark.sql("SELECT * FROM gpart.t5").columns.toSeq === Seq("id", "repo"))
    spark.sql("ALTER TABLE gpart.t5 ADD COLUMN tag STRING")
    assert(spark.sql("SELECT * FROM gpart.t5").columns.toSeq ===
      Seq("id", "repo", "tag"))
    // pre-add dirs read null in every partition log
    assert(spark.sql("SELECT count(*) FROM gpart.t5 WHERE tag IS NULL")
      .head.getLong(0) === 2)
    spark.sql("INSERT INTO gpart.t5 VALUES (8, 'beta', 'tagged')")
    assert(spark.sql("SELECT tag FROM gpart.t5 WHERE id = 8").head.getString(0)
      === "tagged")

    // an EMPTY partitioned table answers schema from the marker
    spark.sql("DROP TABLE IF EXISTS gpart.t6")
    spark.sql("CREATE TABLE gpart.t6 (k BIGINT, src STRING) USING graft " +
      "PARTITIONED BY (src)")
    assert(spark.sql("SELECT * FROM gpart.t6").columns.toSeq === Seq("k", "src"))
    assert(spark.sql("SELECT * FROM gpart.t6").count() === 0)
    assert(spark.sql("SHOW TABLES IN gpart").collect()
      .map(_.getString(1)).contains("t6"))
    spark.sql("DROP TABLE gpart.t6")
    assert(!spark.catalog.tableExists("gpart.t6"))
    spark.sql("DROP TABLE gpart.t5")
  }
}
