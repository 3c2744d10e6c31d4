package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** `spark.readStream.format("graft")` — the LIVE log-following change
  * source: commits that land AFTER the stream starts must surface at the
  * next trigger (the capability the spool-based ChangeFeed.streamChanges
  * deliberately lacks).
  */
class GraftStreamSourceSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_stream_${name}_${spark.sparkContext.applicationId}"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  test("snapshot-then-follow: live commits stream as keyed diffs") {
    import spark.implicits._
    val root = freshRoot("live")
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))

    val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    val q = spark.readStream.format("graft")
      .option("keyCols", "id").load(s"$root/t")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= batch.collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.toSet === Set((1L, "a", "insert", 0L), (2L, "b", "insert", 0L)))

      // a commit AFTER stream start must arrive at the next trigger
      seen.clear()
      vt.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(seen.toSet === Set((3L, "c", "insert", 1L)))

      // keyed update + delete surface with CDF change types
      seen.clear()
      vt.merge(Seq((2L, "z2")).toDF("id", "v"), keyCols = Seq("id"),
        orderCol = "v") // "z2" > "b": the update row wins the merge
      vt.delete(col("id") === 1L)
      q.processAllAvailable()
      val byType = seen.groupBy(_._3)
      assert(byType("update_preimage").map(t => (t._1, t._2)) == Seq((2L, "b")))
      assert(byType("update_postimage").map(t => (t._1, t._2)) == Seq((2L, "z2")))
      assert(byType("delete").map(t => (t._1, t._2)) == Seq((1L, "a")))
    } finally q.stop()
  }

  test("startingVersion anchors history inclusively") {
    import spark.implicits._
    val root = freshRoot("anchor")
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((1L, "a")).toDF("id", "v"))
    vt.append(Seq((2L, "b")).toDF("id", "v"))
    vt.append(Seq((3L, "c")).toDF("id", "v"))

    val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, Long)]
    val q = spark.readStream.format("graft")
      .option("keyCols", "id").option("startingVersion", "1")
      .load(s"$root/t")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= batch.collect().map(r =>
          (r.getLong(0), r.getString(2), r.getLong(3)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // anchor v1's state as inserts, then v2's diff
      assert(seen.toSet === Set((1L, "insert", 1L), (2L, "insert", 1L),
        (3L, "insert", 2L)))
    } finally q.stop()
  }

  test("missing keyCols rejects loudly") {
    import spark.implicits._
    val root = freshRoot("nokeys")
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val e = intercept[Exception] {
      spark.readStream.format("graft").load(s"$root/t")
        .writeStream.format("noop").start()
    }
    assert(e.getMessage.contains("keyCols") ||
      e.getCause != null && e.getCause.getMessage.contains("keyCols"))
  }

  test("a mid-stream ADD COLUMN does not crash the CDF stream") {
    import spark.implicits._
    val root = freshRoot("midadd")
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, String)]
    val q = spark.readStream.format("graft").option("keyCols", "id")
      .load(s"$root/t")
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // schema evolves mid-flight: the stream's PINNED schema keeps it
      // running — new rows surface, the added column is simply invisible
      // until a restart
      vt.addColumn("note", org.apache.spark.sql.types.StringType)
      import org.apache.spark.sql.functions.lit
      vt.append(Seq((2L, "b")).toDF("id", "v")
        .withColumn("note", lit("n2")))
      q.processAllAvailable()
      assert(seen.toSet === Set((1L, "a", "insert"), (2L, "b", "insert")))
    } finally q.stop()
  }

  test("a vacuumed checkpointed offset fails loudly, never re-emits") {
    import spark.implicits._
    val root = freshRoot("vacoffset")
    val vt = VersionedTable(spark, s"$root/t")
    vt.overwrite(Seq((1L, "a")).toDF("id", "v"))
    def run(): Seq[(Long, String, String)] = {
      val seen = scala.collection.mutable.ListBuffer.empty[(Long, String, String)]
      val q = spark.readStream.format("graft").option("keyCols", "id")
        .load(s"$root/t")
        .writeStream.option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= b.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toList
    }
    assert(run().toSet === Set((1L, "a", "insert"))) // checkpoint at v0
    // retention drops the checkpointed version; restart must REFUSE to
    // anchor on a newer survivor (that would re-emit delivered rows as
    // fresh inserts and collapse multi-commit deltas)
    vt.append(Seq((2L, "b")).toDF("id", "v"))
    vt.append(Seq((3L, "c")).toDF("id", "v"))
    vt.vacuum(keepVersions = 1, orphanRetentionMs = 0L)
    assert(vt.versions === Seq(2L))
    val e = intercept[Exception] { run() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("vacuumed")), e.toString)
  }
}
