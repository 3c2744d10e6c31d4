package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftStreamSink, VersionedTable}

/** `writeStream.format("graft")` — exactly-once append sink on the
  * versioned-table commit protocol.
  */
class GraftStreamSinkSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_sink_${name}_${spark.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  test("graft-to-graft replication: source commits land in the sink table") {
    val root = freshRoot("repl")
    import spark.implicits._
    val base = VersionedTable(spark, s"$root/base")
    base.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.format("graft").option("keyCols", "id")
      .load(s"$root/base")
      .filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version")
      .writeStream.format("graft")
      .option("checkpointLocation", s"$root/ckpt")
      .option("path", s"$root/sink").start()
    try {
      q.processAllAvailable()
      base.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
    } finally q.stop()
    val sink = VersionedTable(spark, s"$root/sink")
    assert(sink.read().orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // every sink commit carries the exactly-once ledger stamp
    val ops = sink.versions.map(v => sink.manifestOf(v).operation)
    assert(ops.nonEmpty && ops.forall(_.startsWith("stream_append:")), ops)
  }

  test("replayed batch ids are skipped — exactly-once under recovery") {
    val root = freshRoot("replay")
    import spark.implicits._
    val vt = VersionedTable(spark, s"$root/t")
    val sink = new GraftStreamSink(spark, vt, mergeSchema = false)
    val b0 = Seq((1L, "a")).toDF("id", "v")
    sink.addBatch(0L, b0)
    sink.addBatch(0L, b0)                      // same-instance replay
    sink.addBatch(0L, Seq((9L, "x")).toDF("id", "v")) // replay with new data: still skipped
    assert(vt.read().count() === 1)
    sink.addBatch(1L, Seq((2L, "b")).toDF("id", "v"))
    assert(vt.read().count() === 2)
    // a FRESH sink instance (post-crash restart) consults the log
    val sink2 = new GraftStreamSink(spark, vt, mergeSchema = false)
    sink2.addBatch(1L, Seq((9L, "x")).toDF("id", "v"))
    assert(vt.read().count() === 2, "recovered sink must skip committed batch")
    sink2.addBatch(2L, Seq((3L, "c")).toDF("id", "v"))
    assert(vt.read().orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("the exactly-once ledger survives a vacuum that drops the manifests") {
    val root = freshRoot("vacledger")
    import spark.implicits._
    val vt = VersionedTable(spark, s"$root/t")
    val sink = new GraftStreamSink(spark, vt, mergeSchema = false)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "q-vac")
    sink.addBatch(0L, Seq((1L, "a")).toDF("id", "v"))
    sink.addBatch(1L, Seq((2L, "b")).toDF("id", "v"))
    // another writer commits, then retention drops every old manifest —
    // including both stream_append entries
    vt.append(Seq((9L, "x")).toDF("id", "v"))
    vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(vt.versions.size === 1)
    // a post-crash sink instance must STILL skip the committed batches
    val sink2 = new GraftStreamSink(spark, vt, mergeSchema = false)
    sink2.addBatch(1L, Seq((99L, "dup")).toDF("id", "v"))
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    assert(vt.read().count() === 3, "vacuum erased the exactly-once ledger")
  }

  test("per-query ledgers are independent on a shared table") {
    val root = freshRoot("multi")
    import spark.implicits._
    val vt = VersionedTable(spark, s"$root/t")
    // simulate two distinct queries via the local property the sink reads
    val sink = new GraftStreamSink(spark, vt, mergeSchema = false)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "q-one")
    sink.addBatch(0L, Seq((1L, "a")).toDF("id", "v"))
    val sinkB = new GraftStreamSink(spark, vt, mergeSchema = false)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "q-two")
    sinkB.addBatch(0L, Seq((2L, "b")).toDF("id", "v")) // same batchId, other query
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    assert(vt.read().count() === 2)
  }

  test("non-append output modes are rejected") {
    val root = freshRoot("mode")
    import spark.implicits._
    val base = VersionedTable(spark, s"$root/base")
    base.overwrite(Seq((1L, "a")).toDF("id", "v"))
    // the V2 route rejects Complete when the write plans (asynchronously)
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft").option("keyCols", "id")
        .load(s"$root/base")
        .groupBy("id").count()
        .writeStream.format("graft").outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt")
        .option("path", s"$root/sink").start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("Append output mode only") ||
      m.contains("does not support Complete")), e.toString)
  }

  test("vacuum folds a manifest-only epoch into the sidecar (crash window)") {
    val root = freshRoot("crashwin")
    import spark.implicits._
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((0L, "z")).toDF("id", "v"))
    // a sink that crashed BETWEEN the table commit and the sidecar write
    // leaves the manifest ledger entry as the epoch's only witness
    vt.appendRetrying(Seq((1L, "a")).toDF("id", "v"),
      operation = "stream_append:q-crash:7")
    vt.append(Seq((9L, "x")).toDF("id", "v"))
    vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(vt.versions.size === 1)
    // checkpoint recovery replays epoch 7: with the manifest gone, only
    // the vacuum-written sidecar can prevent a double-append
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "q-crash")
    val sink = new GraftStreamSink(spark, vt, mergeSchema = false)
    sink.addBatch(7L, Seq((8L, "dup")).toDF("id", "v"))
    assert(vt.read().count() === 3,
      "epoch recorded only in a dropped manifest must still be skipped")
    sink.addBatch(8L, Seq((2L, "b")).toDF("id", "v"))
    assert(vt.read().count() === 4)
  }
}
