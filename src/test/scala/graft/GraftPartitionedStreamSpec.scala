package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.{GraftPartitionedStreamingWrite, PartitionedVersionedTable}

/** Streaming on the SHARDED layout: `readStream.table` composes the member
  * append streams, `writeStream.toTable` routes per-partition adoption
  * commits plus one coordinator snapshot per epoch, and checkpoint replay
  * of a committed epoch is skipped per member (exactly-once data).
  */
class GraftPartitionedStreamSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_pts_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gpts", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpts.warehouse", w)
    w
  }

  private def ckpt(name: String): String = {
    val p = s"$warehouse/_ckpt_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  test("readStream.table follows per-partition appends; new partitions join mid-stream") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpts.src")
    spark.sql("CREATE TABLE gpts.src (id BIGINT, repo STRING) USING graft " +
      "PARTITIONED BY (repo)")
    spark.sql("INSERT INTO gpts.src VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    val outPath = s"$warehouse/_out_src"
    val q = spark.readStream.table("gpts.src")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt("src"))
      .option("path", outPath).start()
    try {
      q.processAllAvailable()
      // one existing shard advances, one brand-new shard appears
      spark.sql("INSERT INTO gpts.src VALUES (4, 'a'), (5, 'c')")
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outPath)
    assert(out.count() === 5)
    assert(out.groupBy("repo").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("writeStream.toTable routes shards to their own logs + one snapshot per epoch") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpts.flatsrc")
    spark.sql("CREATE TABLE gpts.flatsrc (id BIGINT, repo STRING) USING graft")
    spark.sql("INSERT INTO gpts.flatsrc VALUES (1, 'x'), (2, 'y'), (3, 'x')")
    spark.sql("DROP TABLE IF EXISTS gpts.psink")
    spark.sql("CREATE TABLE gpts.psink (id BIGINT, repo STRING) USING graft " +
      "PARTITIONED BY (repo)")
    val q = spark.readStream.table("gpts.flatsrc")
      .writeStream
      .option("checkpointLocation", ckpt("psink"))
      .toTable("gpts.psink")
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gpts.flatsrc VALUES (4, 'z')")
      q.processAllAvailable()
    } finally q.stop()
    val pvt = PartitionedVersionedTable(spark, s"$warehouse/psink", "repo")
    assert(pvt.partitions == Seq("x", "y", "z"))
    val got = pvt.read().orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("repo"))).toSeq
    assert(got == Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "z")))
    // each adopted member commit is ledgered as a stream append, and each
    // non-empty epoch stamped exactly one coordinator snapshot
    assert(pvt.partition("x").history().map(_.operation)
      .count(_.startsWith("stream_append:")) == 1)
    val snapOps = pvt.snapshots.map(id => pvt.snapshotDetail(id)._1)
    assert(snapOps.count(_.startsWith("stream_epoch:")) == 2, snapOps.toString)
    // and reading the sink BACK as a stream sees exactly the rows
    val outPath = s"$warehouse/_out_roundtrip"
    val q2 = spark.readStream.table("gpts.psink")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt("roundtrip"))
      .option("path", outPath).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(outPath).count() === 4)
  }

  test("checkpoint replay of a committed epoch adopts nothing (exactly-once)") {
    val root = s"$warehouse/replay_tbl"
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("repo", StringType)))
    val pvt = PartitionedVersionedTable(spark, root, "repo")
    val write = new GraftPartitionedStreamingWrite(pvt, "q-replay", schema,
      mergeSchema = false)

    def runEpoch(epochId: Long): Unit = {
      val factory = write.createStreamingWriterFactory(null)
      val w = factory.createWriter(0, 7L, epochId)
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      Seq((10L, "a"), (11L, "b")).foreach { case (id, repo) =>
        w.write(ser(org.apache.spark.sql.Row(id, repo)).copy())
      }
      val msg = w.commit()
      write.commit(epochId, Array(msg))
    }

    runEpoch(0L)
    val vA = pvt.partition("a").latestVersion.get
    val vB = pvt.partition("b").latestVersion.get
    val snaps = pvt.snapshots.size
    assert(pvt.read().count() === 2)

    // a restarted query replays the SAME epoch from its checkpoint: the
    // member ledgers recognize it — no member advances, no duplicate rows
    runEpoch(0L)
    assert(pvt.partition("a").latestVersion.get == vA)
    assert(pvt.partition("b").latestVersion.get == vB)
    assert(pvt.read().count() === 2)
    assert(pvt.snapshots.size == snaps)

    // the NEXT epoch commits normally
    runEpoch(1L)
    assert(pvt.read().count() === 4)
    assert(pvt.partition("a").latestVersion.get == vA + 1)
  }

  test("streaming write names DATE-partition dirs exactly like the batch path") {
    import spark.implicits._
    val root = s"$warehouse/date_tbl"
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("day", org.apache.spark.sql.types.DateType)))
    val pvt = PartitionedVersionedTable(spark, root, "day")
    val write = new GraftPartitionedStreamingWrite(pvt, "q-date", schema,
      mergeSchema = false)
    val factory = write.createStreamingWriterFactory(null)
    val w = factory.createWriter(0, 3L, 0L)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
      .createSerializer()
    Seq("2024-01-01", "2024-01-02", "2024-01-01").zipWithIndex.foreach {
      case (d, i) =>
        w.write(ser(org.apache.spark.sql.Row(
          i.toLong, java.sql.Date.valueOf(d))).copy())
    }
    write.commit(0L, Array(w.commit()))
    // dirs carry the CAST-to-string day, not the internal days-since-epoch
    // int — the name the batch slicer would produce
    assert(pvt.partitions == Seq("2024-01-01", "2024-01-02"))
    // and a batch append of the same day lands in the SAME member log
    pvt.append(Seq((9L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "day"))
    assert(pvt.partitions == Seq("2024-01-01", "2024-01-02"))
    assert(pvt.read().count() === 4)
  }

  test("a member rewrite mid-stream fails with the CDF pointer") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpts.rw")
    spark.sql("CREATE TABLE gpts.rw (id BIGINT, repo STRING) USING graft " +
      "PARTITIONED BY (repo)")
    spark.sql("INSERT INTO gpts.rw VALUES (1, 'a'), (2, 'b')")
    val q = spark.readStream.table("gpts.rw")
      .writeStream.format("memory").queryName("gpts_rw_mem")
      .option("checkpointLocation", ckpt("rw")).start()
    try {
      q.processAllAvailable()
      spark.sql("DELETE FROM gpts.rw WHERE id = 1")
      val e = intercept[Exception] { q.processAllAvailable() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("append-shaped")), e.toString)
    } finally q.stop()
  }

  test("a member removed or regressed mid-stream fails loudly, never skips") {
    import graft.sources.GraftPartitionedMicroBatchStream
    warehouse
    spark.sql("DROP TABLE IF EXISTS gpts.gone")
    spark.sql("CREATE TABLE gpts.gone (id BIGINT, repo STRING) USING graft " +
      "PARTITIONED BY (repo)")
    spark.sql("INSERT INTO gpts.gone VALUES (1, 'a'), (2, 'b')")
    val pvt = PartitionedVersionedTable(spark, s"$warehouse/gone", "repo")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("repo", StringType)))
    val ms = new GraftPartitionedMicroBatchStream(pvt, schema, schema)
    def off(json: String) = ms.deserializeOffset(json)
    // baseline: a well-formed window plans fine
    val end0 = ms.latestOffset()
    assert(ms.planInputPartitions(ms.initialOffset(), end0).nonEmpty)
    // a member present at START but absent at END = dir removed out from
    // under the stream — loud failure, not a silent zero-file window
    val eGone = intercept[IllegalStateException] {
      ms.planInputPartitions(off("""{"a":0,"b":0,"zz":0}"""), end0)
    }
    assert(eGone.getMessage.contains("missing from the end offset"),
      eGone.getMessage)
    // a version REGRESSION (member restore) is the same discipline
    val eBack = intercept[IllegalStateException] {
      ms.planInputPartitions(off("""{"a":5}"""), end0)
    }
    assert(eBack.getMessage.contains("regressed"), eBack.getMessage)

    // the offset vector is O(members) checkpoint bytes per trigger: past
    // the conf'd member cap, latestOffset rejects naming the conf
    spark.conf.set(GraftPartitionedMicroBatchStream.MaxMembersConf, "1")
    try {
      val eCap = intercept[IllegalArgumentException] { ms.latestOffset() }
      assert(eCap.getMessage.contains(
        GraftPartitionedMicroBatchStream.MaxMembersConf), eCap.getMessage)
    } finally
      spark.conf.unset(GraftPartitionedMicroBatchStream.MaxMembersConf)
  }
}
