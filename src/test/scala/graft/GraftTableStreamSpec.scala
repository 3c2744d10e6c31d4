package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** `spark.readStream.table("cat.t")` — the DSv2 micro-batch stream over a
  * governed table: append-shaped commits surface as new micro-batches.
  */
class GraftTableStreamSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_ts_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gts", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gts.warehouse", w)
    w
  }

  private def ckpt(name: String): String = {
    val p = s"$warehouse/_ckpt_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  test("readStream.table follows appends across triggers") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.t1")
    spark.sql("CREATE TABLE gts.t1 (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gts.t1 VALUES (1, 'a'), (2, 'b')")
    val outPath = s"$warehouse/_out_t1"
    val q = spark.readStream.table("gts.t1")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt("t1"))
      .option("path", outPath).start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gts.t1 VALUES (3, 'c')")
      spark.sql("INSERT INTO gts.t1 VALUES (4, 'd'), (5, 'e')")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outPath)
    assert(out.count() === 5)
    assert(out.agg(sum("id")).head.getLong(0) === 15L)
  }

  test("graft-to-graft: streaming table read into the graft sink") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.src")
    spark.sql("CREATE TABLE gts.src (id BIGINT) USING graft")
    spark.sql("INSERT INTO gts.src SELECT id FROM range(10)")
    val sinkRoot = s"$warehouse/_sink_g2g"
    val q = spark.readStream.table("gts.src")
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt("g2g"))
      .option("path", sinkRoot).start()
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gts.src SELECT id FROM range(10, 15)")
      q.processAllAvailable()
    } finally q.stop()
    val sink = VersionedTable(spark, sinkRoot)
    assert(sink.read().count() === 15)
    assert(sink.read().agg(sum("doubled")).head.getLong(0) === (0L until 15L).map(_ * 2).sum)
  }

  test("a rewrite commit mid-stream fails with a CDF pointer") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.t2")
    spark.sql("CREATE TABLE gts.t2 (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gts.t2 VALUES (1, 'a'), (2, 'b')")
    val q = spark.readStream.table("gts.t2")
      .writeStream.format("memory").queryName("gts_t2_mem")
      .option("checkpointLocation", ckpt("t2")).start()
    try {
      q.processAllAvailable()
      spark.sql("DELETE FROM gts.t2 WHERE id = 1")
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("append-shaped")), e.toString)
    } finally q.stop()
  }

  test("a vacuumed offset window fails loudly instead of losing the batch") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.t4")
    spark.sql("CREATE TABLE gts.t4 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gts.t4 SELECT id FROM range(3)")
    val vt = VersionedTable(spark, s"$warehouse/t4")
    val stream = new graft.sources.GraftMicroBatchStream(vt,
      vt.tableSchema.get, vt.tableSchema.get)
    val anchor = stream.latestOffset()
    spark.sql("INSERT INTO gts.t4 SELECT id FROM range(3, 5)")
    val end = stream.latestOffset()
    // retention drops the window's manifests while the stream is down
    spark.sql("INSERT INTO gts.t4 SELECT id FROM range(5, 6)")
    vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(anchor, end)
    }
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("an anchor snapshot carrying DVs fails with the CDF pointer") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.t5")
    spark.sql("CREATE TABLE gts.t5 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gts.t5 SELECT id FROM range(4)")
    val vt = VersionedTable(spark, s"$warehouse/t5")
    // merge-on-read delete lands between table resolution and trigger 1
    vt.delete(org.apache.spark.sql.functions.col("id") === 1L,
      useDeletionVectors = true)
    val stream = new graft.sources.GraftMicroBatchStream(vt,
      vt.tableSchema.get, vt.tableSchema.get)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(stream.initialOffset(), stream.latestOffset())
    }
    assert(e.getMessage.contains("deletion vectors") ||
      e.getMessage.contains("append-shaped"), e.getMessage)
  }

  test("a column-mapped table does not advertise streaming reads") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.t3")
    spark.sql("CREATE TABLE gts.t3 (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gts.t3 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gts.t3 RENAME COLUMN v TO w")
    val e = intercept[Exception] {
      val q = spark.readStream.table("gts.t3")
        .writeStream.format("memory").queryName("gts_t3_mem")
        .option("checkpointLocation", ckpt("t3")).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("does not support") ||
      m.contains("MICRO_BATCH_READ") || m.contains("streaming read")), e.toString)
  }

  test("cat.t.changes streams keyed CDF diffs — incl. the rewrites the plain table stream rejects") {
    import spark.implicits._
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.tc")
    spark.sql("CREATE TABLE gts.tc (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gts.tc VALUES (1, 'a'), (2, 'b')")
    val vt = VersionedTable(spark, s"$warehouse/tc")
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    val q = spark.readStream.option("keyCols", "id")
      .table("gts.tc.changes")
      .writeStream.option("checkpointLocation", ckpt("tc"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.map(t => (t._1, t._2, t._3)).toSet ===
        Set((1L, "a", "insert"), (2L, "b", "insert")))
      seen.clear()
      // a rewrite (merge + delete) lands LIVE: the plain table stream
      // would reject this — the changes table diffs it by key
      vt.merge(Seq((2L, "z2")).toDF("id", "v"), keyCols = Seq("id"),
        orderCol = "v")
      spark.sql("DELETE FROM gts.tc WHERE id = 1")
      q.processAllAvailable()
      val byType = seen.groupBy(_._3)
      assert(byType("update_preimage").map(t => (t._1, t._2)) == Seq((2L, "b")))
      assert(byType("update_postimage").map(t => (t._1, t._2)) == Seq((2L, "z2")))
      assert(byType("delete").map(t => (t._1, t._2)) == Seq((1L, "a")))
    } finally q.stop()

    // endingVersion BOUNDS the stream: a replay capped at the first
    // insert commit never sees the later merge/delete versions
    val bounded = scala.collection.mutable.ListBuffer.empty[Long]
    val q2 = spark.readStream.option("keyCols", "id")
      .option("startingVersion", "0").option("endingVersion", "1")
      .table("gts.tc.changes")
      .writeStream.option("checkpointLocation", ckpt("tc2"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        bounded ++= b.collect().map(_.getLong(3)) // _commit_version
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(bounded.nonEmpty && bounded.forall(_ <= 1L),
      s"endingVersion=1 must cap delivered commits, got $bounded")
  }

  test("the changes table requires keyCols; batch reads are anchored table_changes") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gts.tk")
    spark.sql("CREATE TABLE gts.tk (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gts.tk VALUES (1, 'a')")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception] {
      val q = spark.readStream.table("gts.tk.changes")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt("tk")).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(msgs(e1).exists(_.contains("keyCols")), e1.toString)
    // batch reads need an explicit anchor
    val e2 = intercept[Exception] {
      spark.read.option("keyCols", "id").table("gts.tk.changes").collect()
    }
    assert(msgs(e2).exists(_.contains("startingVersion")), e2.toString)
    // with one, the batch read IS table_changes(start, end)
    spark.sql("INSERT INTO gts.tk VALUES (2, 'b')")
    val diffs = spark.read.option("keyCols", "id")
      .option("startingVersion", "2").table("gts.tk.changes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(diffs.toSeq === Seq((2L, "b", "insert", 2L)))
    val all = spark.read.option("keyCols", "id")
      .option("startingVersion", "0").table("gts.tk.changes")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(all.toSet === Set((1L, "insert"), (2L, "insert")))
    // an out-of-range window ERRORS — it must never read as "no changes"
    for (opts <- Seq(Map("startingVersion" -> "9"),
      Map("startingVersion" -> "1", "endingVersion" -> "9"),
      Map("startingVersion" -> "2", "endingVersion" -> "1"))) {
      val e = intercept[Exception] {
        opts.foldLeft(spark.read.option("keyCols", "id")) {
          case (r, (k, v)) => r.option(k, v)
        }.table("gts.tk.changes").collect()
      }
      assert(msgs(e).exists(_.contains("out of range")), s"$opts -> $e")
    }
    // a REAL table named `changes` shadows the virtual one
    spark.sql("DROP TABLE IF EXISTS gts.changes")
    spark.sql("CREATE TABLE gts.changes (k BIGINT) USING graft")
    spark.sql("INSERT INTO gts.changes VALUES (7)")
    assert(spark.sql("SELECT k FROM gts.changes").head.getLong(0) === 7L)
    spark.sql("DROP TABLE gts.changes")
  }
}
