package graft

import org.apache.spark.sql.functions._

import graft.sources.PartitionedVersionedTable

/** `cat.t.changes` over the PARTITIONED layout
  * ([[graft.sources.GraftPartitionedChangesTable]]): offsets are
  * coordinator snapshot ids, diffs carry the partition column, untouched
  * partitions contribute zero rows, retention holes fail loudly, and the
  * table-level `key_cols` default serves pure-SQL consumers.
  */
class GraftPartitionedCdfSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_pcdf_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gpcdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpcdf.warehouse", w)
    w
  }

  private def ckpt(name: String): String = {
    val p = s"$warehouse/_ckpt_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  private def fresh(name: String, keyProps: String = ""): PartitionedVersionedTable = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS gpcdf.$name")
    spark.sql(s"CREATE TABLE gpcdf.$name (id BIGINT, repo STRING, n BIGINT) " +
      s"USING graft PARTITIONED BY (repo)$keyProps")
    spark.sql(s"INSERT INTO gpcdf.$name VALUES " + // snapshot 0
      "(1, 'alpha', 10), (2, 'alpha', 20), (3, 'beta', 30), (4, 'gamma', 40)")
    PartitionedVersionedTable(spark, s"$warehouse/$name", "repo")
  }

  test("batch window replays per-snapshot member diffs of touched partitions only") {
    val pvt = fresh("c1")
    // snapshot 1: UPDATE touches alpha only (partition-pruned sweep would
    // still commit a no-op version in others — verify zero DIFF rows)
    spark.sql("UPDATE gpcdf.c1 SET n = n + 1 WHERE repo = 'alpha' AND id = 1")
    // snapshot 2: INSERT creates a brand-new partition
    spark.sql("INSERT INTO gpcdf.c1 VALUES (9, 'delta', 90)")

    val w1 = spark.read.option("keyCols", "id")
      .option("startingVersion", "1").option("endingVersion", "1")
      .table("gpcdf.c1.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(w1.map(_._2).toSet === Set("alpha"),
      s"only the touched partition may contribute diff rows: ${w1.toSeq}")
    assert(w1.toSet === Set(
      (1L, "alpha", 10L, "update_preimage", 1L),
      (1L, "alpha", 11L, "update_postimage", 1L)))

    val w2 = spark.read.option("keyCols", "id")
      .option("startingVersion", "2").table("gpcdf.c1.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(w2.toSet === Set((9L, "delta", "insert")),
      "a partition born in the window surfaces as inserts")

    // since-genesis: snapshot 0's rows anchor as inserts, then the diffs
    val all = spark.read.option("keyCols", "id")
      .option("startingVersion", "0").table("gpcdf.c1.changes")
    assert(all.filter(col("_change_type") === "insert").count() === 5L)
    assert(all.filter(col("_commit_version") === 0L).count() === 4L)

    // out-of-range windows ERROR (snapshot-id domain, latest = 2)
    for (opts <- Seq(Map("startingVersion" -> "9"),
      Map("startingVersion" -> "1", "endingVersion" -> "9"))) {
      val e = intercept[Exception] {
        opts.foldLeft(spark.read.option("keyCols", "id")) {
          case (r, (k, v)) => r.option(k, v)
        }.table("gpcdf.c1.changes").collect()
      }
      assert(msgs(e).exists(_.contains("out of range")), e.toString)
    }
    spark.sql("DROP TABLE gpcdf.c1")
  }

  test("write-time materialized member commits serve partitioned CDF from _change_data") {
    val pvt = fresh("c9")
    // the member commit hook is the FLAT one — a partitioned table's
    // member merges/updates route through the same commit() path, so the
    // session conf materializes each touched member's row-grain change
    // set under <member>/_change_data/v<N> at write time
    spark.conf.set(graft.sources.VersionedTable.WriteCdfConf, "true")
    try spark.sql(
      "UPDATE gpcdf.c9 SET n = n + 1 WHERE repo = 'alpha' AND id = 1")
    finally spark.conf.unset(graft.sources.VersionedTable.WriteCdfConf)
    val cd = new org.apache.hadoop.fs.Path(
      s"$warehouse/c9/repo=alpha/_change_data")
    val fs = cd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(cd), "member commit must materialize _change_data")

    val diffs = spark.read.option("keyCols", "id")
      .option("startingVersion", "1").option("endingVersion", "1")
      .table("gpcdf.c9.changes")
    val rows = diffs.collect().map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("n"), r.getAs[String]("_change_type"))).toSet
    assert(rows === Set((1L, 10L, "update_preimage"),
      (1L, 11L, "update_postimage")), rows.toString)
    // scanReport-style pin on the INNER frame (the catalog spelling wraps
    // it in a V1 relation whose executedPlan hides file paths): the
    // transition's read opens the materialized change file ONLY — never
    // the member's rewritten data dirs
    import graft.sources.GraftPartitionedChangeBatches
    val inner = GraftPartitionedChangeBatches.frame(pvt, Seq("id"),
      None, Some(0L), 1L,
      GraftPartitionedChangeBatches.cdfSchema(pvt.tableSchema.get))
    inner.collect()
    val plan = inner.queryExecution.executedPlan.toString
    assert(plan.contains("_change_data"),
      s"materialized transition must read _change_data:\n$plan")
    assert(!plan.contains("/data/c"),
      s"materialized transition must not re-open member data dirs:\n$plan")
    spark.sql("DROP TABLE gpcdf.c9")
  }

  test("a composite key NAMING the partition column still diffs (no dup join key)") {
    fresh("c7")
    spark.sql("UPDATE gpcdf.c7 SET n = n + 5 WHERE repo = 'beta' AND id = 3")
    // keyCols = (repo, id): the cross-member join must not duplicate the
    // partition column in its key list
    val w = spark.read.option("keyCols", "repo,id")
      .option("startingVersion", "1").option("endingVersion", "1")
      .table("gpcdf.c7.changes")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("repo"),
        r.getAs[Long]("n"), r.getAs[String]("_change_type")))
    assert(w.toSet === Set(
      (3L, "beta", 30L, "update_preimage"),
      (3L, "beta", 35L, "update_postimage")), w.toSeq.toString)
  }

  test("TBLPROPERTIES key_cols serves as the default entity key") {
    fresh("c2", keyProps = " TBLPROPERTIES ('key_cols' = 'id')")
    spark.sql("UPDATE gpcdf.c2 SET n = 99 WHERE repo = 'beta'")
    // no keyCols reader option anywhere — the table default drives the diff
    val diffs = spark.read.option("startingVersion", "1")
      .table("gpcdf.c2.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    assert(diffs.toSet === Set(
      (3L, "beta", 30L, "update_preimage"),
      (3L, "beta", 99L, "update_postimage")))
    // without either option or default, the read rejects with guidance
    fresh("c3")
    spark.sql("UPDATE gpcdf.c3 SET n = 0 WHERE repo = 'beta'")
    val e = intercept[Exception] {
      spark.read.option("startingVersion", "1")
        .table("gpcdf.c3.changes").collect()
    }
    assert(msgs(e).exists(m => m.contains("keyCols") && m.contains("key_cols")),
      e.toString)
    spark.sql("DROP TABLE gpcdf.c2")
    spark.sql("DROP TABLE gpcdf.c3")
  }

  test("streaming follows the snapshot log; endingVersion bounds it") {
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    fresh("c4", keyProps = " TBLPROPERTIES ('key_cols' = 'id')")
    val q = spark.readStream
      .table("gpcdf.c4.changes")
      .writeStream.option("checkpointLocation", ckpt("c4"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(3), r.getLong(4)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // anchor: the latest snapshot's rows as inserts
      assert(seen.map(t => (t._1, t._3)).toSet ===
        Set((1L, "insert"), (2L, "insert"), (3L, "insert"), (4L, "insert")))
      seen.clear()
      // a live MERGE touching two of three partitions streams as keyed
      // diffs carrying the partition column
      spark.sql("""MERGE INTO gpcdf.c4 t
                  |USING (SELECT * FROM VALUES (1, 'alpha', 100), (3, 'beta', 300)
                  |       AS s(sid, srepo, sn)) s
                  |ON t.repo = s.srepo AND t.id = s.sid
                  |WHEN MATCHED THEN UPDATE SET n = s.sn
                  |""".stripMargin)
      q.processAllAvailable()
      assert(seen.map(t => (t._1, t._2, t._3)).toSet === Set(
        (1L, "alpha", "update_preimage"), (1L, "alpha", "update_postimage"),
        (3L, "beta", "update_preimage"), (3L, "beta", "update_postimage")),
        seen.toString)
      assert(seen.map(_._4).toSet === Set(1L),
        "_commit_version must be the MERGE's snapshot id")
    } finally q.stop()

    // endingVersion caps delivered snapshots
    val bounded = scala.collection.mutable.ListBuffer.empty[Long]
    val q2 = spark.readStream
      .option("startingVersion", "0").option("endingVersion", "0")
      .table("gpcdf.c4.changes")
      .writeStream.option("checkpointLocation", ckpt("c4b"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        bounded ++= b.collect().map(_.getLong(4))
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(bounded.nonEmpty && bounded.forall(_ <= 0L),
      s"endingVersion=0 must cap delivered snapshots, got $bounded")
    spark.sql("DROP TABLE gpcdf.c4")
  }

  test("retention holes fail loudly instead of re-emitting or collapsing") {
    val pvt = fresh("c5", keyProps = " TBLPROPERTIES ('key_cols' = 'id')")
    spark.sql("UPDATE gpcdf.c5 SET n = 1 WHERE repo = 'alpha' AND id = 1")
    spark.sql("UPDATE gpcdf.c5 SET n = 2 WHERE repo = 'alpha' AND id = 1")
    spark.sql("UPDATE gpcdf.c5 SET n = 3 WHERE repo = 'alpha' AND id = 1")
    // vacuum keeps only the newest snapshot (and the member versions the
    // surviving snapshots pin): the [1, 3] window now has holes
    pvt.vacuum(keepSnapshots = 1, orphanRetentionMs = 0L)
    val e = intercept[Exception] {
      spark.read.option("startingVersion", "1")
        .table("gpcdf.c5.changes").collect()
    }
    assert(msgs(e).exists(m => m.contains("vacuum")), e.toString)
    spark.sql("DROP TABLE gpcdf.c5")
  }
}
