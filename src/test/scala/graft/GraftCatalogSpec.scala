package graft

import org.apache.spark.sql.functions._

/** SQL-text surface over [[graft.sources.GraftCatalog]]: CREATE / INSERT /
  * SELECT (incl. time travel) / ALTER / DROP must all land on the same
  * transaction-log protocol the API surface uses.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_cat_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gtest",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", w)
    w
  }

  test("create, insert, select, time travel, overwrite, alter, drop") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gtest.t1")
    spark.sql("CREATE TABLE gtest.t1 (id BIGINT, status STRING) USING graft")
    assert(spark.sql("SELECT * FROM gtest.t1").count() === 0)

    spark.sql("INSERT INTO gtest.t1 VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gtest.t1 VALUES (3, 'a')")
    assert(spark.sql("SELECT count(*) FROM gtest.t1").head.getLong(0) === 3)
    assert(spark.sql(
      "SELECT count(*) FROM gtest.t1 WHERE status = 'a'").head.getLong(0) === 2)

    // VERSION AS OF: v0 = empty create, v1 = first insert, v2 = second
    assert(spark.sql(
      "SELECT count(*) FROM gtest.t1 VERSION AS OF 1").head.getLong(0) === 2)
    assert(spark.sql(
      "SELECT count(*) FROM gtest.t1 VERSION AS OF 0").head.getLong(0) === 0)

    // TIMESTAMP AS OF the v1 commit time (Spark hands micros to the catalog)
    val vt = graft.sources.VersionedTable(spark, s"$warehouse/t1")
    val t1 = new java.sql.Timestamp(vt.manifestOf(1L).timestampMs)
    assert(spark.sql(
      s"SELECT count(*) FROM gtest.t1 TIMESTAMP AS OF '$t1'")
      .head.getLong(0) === 2)

    spark.sql("INSERT OVERWRITE gtest.t1 VALUES (9, 'z')")
    assert(spark.sql("SELECT count(*) FROM gtest.t1").head.getLong(0) === 1)

    spark.sql("ALTER TABLE gtest.t1 RENAME COLUMN status TO state")
    val cols = spark.sql("SELECT * FROM gtest.t1").columns.toSeq
    assert(cols === Seq("id", "state"))

    assert(spark.sql("SHOW TABLES IN gtest").collect()
      .map(_.getString(1)).contains("t1"))
    spark.sql("DROP TABLE gtest.t1")
    assert(spark.sql("SHOW TABLES IN gtest").collect().isEmpty)
  }

  test("insert enforces the committed schema") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gtest.t2")
    spark.sql("CREATE TABLE gtest.t2 (id BIGINT, status STRING) USING graft")
    // arity mismatch is rejected at analysis; type-incompatible insert is
    // rejected by the table's schema enforcement
    intercept[Exception] {
      spark.sql("INSERT INTO gtest.t2 VALUES (1, 'a', 'extra')")
    }
    spark.sql("DROP TABLE gtest.t2")
  }

  test("ctas-equivalent flow from a source table lands version history") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gtest.orders_sql")
    spark.sql(
      "CREATE TABLE gtest.orders_sql (id BIGINT, price BIGINT) USING graft")
    Tables.orders(spark, sf())
      .select(col("o_orderkey").cast("long").as("id"),
        floor(col("o_totalprice") * 100).cast("long").as("price"))
      .createOrReplaceTempView("orders_src")
    spark.sql("INSERT INTO gtest.orders_sql SELECT * FROM orders_src")
    val n = spark.sql("SELECT count(*) FROM gtest.orders_sql").head.getLong(0)
    assert(n === Tables.orders(spark, sf()).count())
    val api = graft.sources.VersionedTable(spark, s"$warehouse/orders_sql")
    assert(api.versions === Seq(0L, 1L))
    spark.sql("DROP TABLE gtest.orders_sql")
  }

  test("ALTER TABLE ADD COLUMN: metadata-only, null for pre-add dirs, no resurrection") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gtest.t_add")
    spark.sql("CREATE TABLE gtest.t_add (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gtest.t_add VALUES (1, 'a'), (2, 'b')")
    val vt = graft.sources.VersionedTable(spark, s"$warehouse/t_add")
    val dirsBefore = vt.manifestOf(vt.latestVersion.get).dataDirs

    spark.sql("ALTER TABLE gtest.t_add ADD COLUMN score BIGINT")
    assert(vt.manifestOf(vt.latestVersion.get).dataDirs === dirsBefore,
      "ADD COLUMN must not rewrite any dir")
    assert(spark.sql("SELECT * FROM gtest.t_add").columns.toSeq ===
      Seq("id", "v", "score"))
    assert(spark.sql("SELECT count(*) FROM gtest.t_add WHERE score IS NULL")
      .head.getLong(0) === 2)
    spark.sql("INSERT INTO gtest.t_add VALUES (3, 'c', 30)")
    assert(spark.sql("SELECT sum(score) FROM gtest.t_add").head.getLong(0) === 30)

    // drop then re-add the same name: the stale bytes must NOT resurrect
    spark.sql("ALTER TABLE gtest.t_add DROP COLUMN score")
    spark.sql("ALTER TABLE gtest.t_add ADD COLUMN score BIGINT")
    assert(spark.sql(
      "SELECT count(*) FROM gtest.t_add WHERE score IS NOT NULL")
      .head.getLong(0) === 0, "re-added column must read all-null")
    spark.sql("INSERT INTO gtest.t_add VALUES (4, 'd', 40)")
    assert(spark.sql("SELECT sum(score) FROM gtest.t_add").head.getLong(0) === 40)

    // duplicate add rejects; NOT NULL add rejects
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.t_add ADD COLUMN score BIGINT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.t_add ADD COLUMN must BIGINT NOT NULL")
    }
    spark.sql("DROP TABLE gtest.t_add")
  }

  test("TBLPROPERTIES stats_cols makes SQL-created tables record skipping ledgers") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gtest.t_stats")
    spark.sql("CREATE TABLE gtest.t_stats (id BIGINT, v STRING) USING graft " +
      "TBLPROPERTIES ('stats_cols' = 'id')")
    (0 until 4).foreach { b =>
      spark.sql(s"INSERT INTO gtest.t_stats VALUES (${b * 10}, 'a'), (${b * 10 + 1}, 'b')")
    }
    // min/max answered metadata-only: the ledger was recorded by the
    // catalog-opened INSERT handles
    val agg = spark.sql("SELECT min(id), max(id), count(id) FROM gtest.t_stats")
    val r = agg.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 31L, 8L)))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      agg.queryExecution.executedPlan.toString)
    // and the scan prunes dirs from those stats
    val vt = graft.sources.VersionedTable(spark, s"$warehouse/t_stats",
      Seq("id"))
    assert(vt.scanReport(col("id") >= 30L).filter(col("opened")).count() === 1)
    // streamed-in dirs keep recording the ledgers: the streaming write
    // path reads the sidecar a catalog CREATE declared
    spark.sql("DROP TABLE IF EXISTS gtest.t_stats_decl")
    spark.sql("CREATE TABLE gtest.t_stats_decl (id BIGINT, v STRING) " +
      "USING graft TBLPROPERTIES ('stats_cols' = 'id')")
    val q2 = spark.readStream.format("graft").option("keyCols", "id")
      .load(s"$warehouse/t_stats")
      .filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$warehouse/_ckpt_tstats2")
      .option("path", s"$warehouse/t_stats_decl").start()
    try q2.processAllAvailable() finally q2.stop()
    val decl = graft.sources.VersionedTable(spark, s"$warehouse/t_stats_decl")
    val dm = decl.manifestOf(decl.latestVersion.get)
    val live = dm.dataDirs.filter(d => dm.dirRows.get(d).exists(_ > 0))
    assert(live.nonEmpty &&
      live.forall(d => dm.stats.get(d).exists(_.contains("id"))),
      s"streamed-in dirs must carry the declared id stats: ${dm.stats}")

    // an unknown stats column rejects at CREATE
    spark.sql("DROP TABLE IF EXISTS gtest.t_bad")
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.t_bad (id BIGINT) USING graft " +
        "TBLPROPERTIES ('stats_cols' = 'nope')")
    }
    spark.sql("DROP TABLE gtest.t_stats")
  }

  test("identifier segments cannot escape the warehouse root") {
    warehouse
    // a victim "table" OUTSIDE the warehouse that a traversal would reach
    val victim = new org.apache.hadoop.fs.Path(
      s"${System.getProperty("java.io.tmpdir")}/graft_victim_${spark.sparkContext.applicationId}")
    val f = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(victim, "_txlog"))
    try {
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      for (stmt <- Seq(
        s"DROP TABLE gtest.`../${victim.getName}`",
        s"DROP TABLE gtest.`..`",
        s"CREATE TABLE gtest.`a/b` (id BIGINT) USING graft",
        s"ALTER TABLE gtest.`../${victim.getName}` RENAME TO gtest.elsewhere")) {
        val e = intercept[Exception] { spark.sql(stmt) }
        assert(msgs(e).exists(m => m.contains("escape the warehouse") ||
          m.contains("TABLE_OR_VIEW_NOT_FOUND") || m.contains("not found")),
          s"$stmt -> $e")
      }
      assert(f.exists(new org.apache.hadoop.fs.Path(victim, "_txlog")),
        "traversal must never delete outside the warehouse")
    } finally f.delete(victim, true)
  }
}
