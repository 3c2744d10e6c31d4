package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._

import graft.sources.VersionedTable
import graft.streaming.UpsertSink

/** Streaming CDC-upsert: each micro-batch becomes one committed MERGE
  * version; in-batch duplicates collapse to the latest per key; earlier
  * versions stay readable (per-batch snapshots).
  */
class StreamUpsertSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType),
    StructField("updated_at", LongType)))

  private def writeBatch(dir: Path, name: String, lines: String*): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("micro-batches MERGE into the versioned table with per-batch snapshots") {
    val src = Files.createTempDirectory("upsert_src")
    val ckpt = Files.createTempDirectory("upsert_ckpt").toString
    val tblDir = Files.createTempDirectory("upsert_tbl").resolve("t").toString
    writeBatch(src, "b1.jsonl",
      """{"id": 1, "v": "a", "updated_at": 1}""",
      """{"id": 2, "v": "b", "updated_at": 1}""")

    val vt = VersionedTable(spark, tblDir)
    val stream = spark.readStream.schema(schema).json(src.toString)
    val q = UpsertSink.start(stream, vt, keyCols = Seq("id"),
      orderCol = "updated_at", tieCols = Seq("v"), checkpoint = ckpt)
    try {
      q.processAllAvailable()
      def state(): Map[Long, String] = vt.read().collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(state() == Map(1L -> "a", 2L -> "b"))
      val vAfterB1 = vt.latestVersion.get

      // batch 2: update id 2, insert id 3 twice (in-batch dup, latest wins)
      writeBatch(src, "b2.jsonl",
        """{"id": 2, "v": "b2", "updated_at": 2}""",
        """{"id": 3, "v": "c", "updated_at": 2}""",
        """{"id": 3, "v": "c2", "updated_at": 3}""")
      q.processAllAvailable()
      assert(state() == Map(1L -> "a", 2L -> "b2", 3L -> "c2"))

      // the pre-batch-2 snapshot is still readable (time travel)
      val before = vt.readVersion(vAfterB1).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
      assert(before == Map(1L -> "a", 2L -> "b"))
      assert(vt.history().head.operation == "merge")
    } finally q.stop()
  }

  test("streamChanges replays commits as micro-batches in commit order") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = Files.createTempDirectory("cdf_stream").toString
    val vt = VersionedTable(spark, s"$root/t")
    def df(rows: (Long, String, Long)*) = rows.toDF("id", "v", "updated_at")
    vt.overwrite(df((1L, "a", 1L), (2L, "b", 1L)))
    vt.merge(df((2L, "b2", 2L), (3L, "c", 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    vt.delete(col("id") === 1L)

    val stream = graft.sources.ChangeFeed.streamChanges(
      spark, vt, keyCols = Seq("id"), s"$root/spool")
    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String, Long)])]
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen += id -> batch.select("id", "_change_type", "_commit_version")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .sortBy(t => (t._1, t._2)).toSeq
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()

    // one micro-batch per commit, in commit order
    assert(seen.map(_._1) == Seq(0L, 1L, 2L))
    // batch 0: the v0 snapshot as inserts
    assert(seen(0)._2 == Seq((1L, "insert", 0L), (2L, "insert", 0L)))
    // batch 1: the merge's keyed diff — update images for 2, insert for 3
    assert(seen(1)._2 == Seq((2L, "update_postimage", 1L),
      (2L, "update_preimage", 1L), (3L, "insert", 1L)))
    // batch 2: the delete
    assert(seen(2)._2 == Seq((1L, "delete", 2L)))

    // startingVersion is INCLUSIVE of the anchor (Delta semantics): the
    // first batch is v1's OWN diff, then v2's — no snapshot batch
    def collectFrom(sv: Long) = {
      val follow = graft.sources.ChangeFeed.streamChanges(
        spark, vt, keyCols = Seq("id"), s"$root/spool_sv$sv",
        startingVersion = Some(sv))
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[Seq[(Long, String, Long)]]
      val q2 = follow.writeStream
        .option("checkpointLocation", s"$root/ckpt_sv$sv")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          acc += batch.select("id", "_change_type", "_commit_version")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            .sortBy(t => (t._1, t._2)).toSeq
          ()
        }.start()
      try q2.processAllAvailable() finally q2.stop()
      acc.toSeq
    }
    assert(collectFrom(1L) == Seq(
      Seq((2L, "update_postimage", 1L), (2L, "update_preimage", 1L),
        (3L, "insert", 1L)),
      Seq((1L, "delete", 2L))),
      "startingVersion=1 must begin with v1's own diff (anchor inclusive)")
    // anchor at the latest commit: exactly that commit's diff
    assert(collectFrom(2L) == Seq(Seq((1L, "delete", 2L))))
    // anchor at the first retained version: its rows as inserts, then all
    // diffs (Delta's startingVersion=0)
    assert(collectFrom(0L) == Seq(
      Seq((1L, "insert", 0L), (2L, "insert", 0L)),
      Seq((2L, "update_postimage", 1L), (2L, "update_preimage", 1L),
        (3L, "insert", 1L)),
      Seq((1L, "delete", 2L))))
  }

  test("startWithView keeps the aggregate equal to a recompute across batches") {
    val src = Files.createTempDirectory("mv_src")
    val ckpt = Files.createTempDirectory("mv_ckpt").toString
    val root = Files.createTempDirectory("mv_tbl")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("grp", StringType),
      StructField("cents", LongType),
      StructField("updated_at", LongType)))

    val base = VersionedTable(spark, root.resolve("base").toString)
    val mv = VersionedTable(spark, root.resolve("mv").toString)
    val stream = spark.readStream.schema(schema).json(src.toString)
    val q = UpsertSink.startWithView(stream, base, mv,
      keyCols = Seq("id"), orderCol = "updated_at", tieCols = Seq("grp"),
      dims = Seq("grp"), valueCol = "cents", checkpoint = ckpt)
    try {
      def viewState(): Map[String, (Long, Long)] = mv.read().collect()
        .map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_value"))).toMap

      // batch 1 bootstraps the view
      writeBatch(src, "b1.jsonl",
        """{"id": 1, "grp": "a", "cents": 10, "updated_at": 1}""",
        """{"id": 2, "grp": "a", "cents": 20, "updated_at": 1}""",
        """{"id": 3, "grp": "b", "cents": 5, "updated_at": 1}""")
      q.processAllAvailable()
      assert(viewState() == Map("a" -> (2L, 30L), "b" -> (1L, 5L)))

      // batch 2: in-group update (+5 on id 2), move id 3 b→c (empties b),
      // insert id 4 — the refreshed view must equal a recompute
      writeBatch(src, "b2.jsonl",
        """{"id": 2, "grp": "a", "cents": 25, "updated_at": 2}""",
        """{"id": 3, "grp": "c", "cents": 5, "updated_at": 2}""",
        """{"id": 4, "grp": "c", "cents": 7, "updated_at": 2}""")
      q.processAllAvailable()
      assert(viewState() == Map("a" -> (2L, 35L), "c" -> (2L, 12L)))
      val recomputed = base.read().groupBy("grp")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("cents"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(viewState() == recomputed)
      // one base version and one view refresh per non-empty batch
      assert(base.versions.size == 2 && mv.versions.size == 2)
    } finally q.stop()
  }

  test("autoCompactDirs bounds fragmentation; view survives compaction versions") {
    val src = Files.createTempDirectory("ac_src")
    val ckpt = Files.createTempDirectory("ac_ckpt").toString
    val root = Files.createTempDirectory("ac_tbl")
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("grp", StringType),
      StructField("cents", LongType),
      StructField("updated_at", LongType)))
    val base = VersionedTable(spark, root.resolve("base").toString)
    val mv = VersionedTable(spark, root.resolve("mv").toString)
    val stream = spark.readStream.schema(schema).json(src.toString)
    val q = UpsertSink.startWithView(stream, base, mv,
      keyCols = Seq("id"), orderCol = "updated_at", tieCols = Seq("grp"),
      dims = Seq("grp"), valueCol = "cents", checkpoint = ckpt,
      autoCompactDirs = 1)
    try {
      // three batches, each inserting a fresh key (every merge adds a dir)
      (1 to 3).foreach { i =>
        writeBatch(src, s"b$i.jsonl",
          s"""{"id": $i, "grp": "g${i % 2}", "cents": ${i * 10}, "updated_at": $i}""")
        q.processAllAvailable()
      }
      // un-compacted this would sit at 3 dirs; the hook folds after each
      // batch, so the live snapshot can reference at most maxDirs + 1
      val dirs = base.manifestOf(base.latestVersion.get).dataDirs.size
      assert(dirs <= 2, s"fragmentation unbounded: $dirs dirs")
      assert(base.history().head.operation == "compact")
      // content unaffected; the view (refreshed ACROSS compact versions —
      // the CDF from a content-identical compact commit must be empty)
      // still equals a recompute
      assert(base.read().count() == 3)
      val view = mv.read().collect()
        .map(r => r.getAs[String]("grp") -> r.getAs[Long]("sum_value")).toMap
      assert(view == Map("g0" -> 20L, "g1" -> 40L))
    } finally q.stop()
  }

  test("autoPackRows packs micro-batch dirs instead of full-snapshot rewrites") {
    val src = Files.createTempDirectory("pack_src")
    val ckpt = Files.createTempDirectory("pack_ckpt").toString
    val tblDir = Files.createTempDirectory("pack_tbl").resolve("t").toString
    val vt = VersionedTable(spark, tblDir)
    writeBatch(src, "b0.jsonl",
      """{"id": 1, "v": "a", "updated_at": 1}""")
    val stream = spark.readStream.schema(schema).json(src.toString)
    val q = UpsertSink.start(stream, vt, keyCols = Seq("id"),
      orderCol = "updated_at", tieCols = Seq("v"), checkpoint = ckpt,
      autoCompactDirs = 2, autoPackRows = 1000L)
    try {
      q.processAllAvailable()
      (1 to 4).foreach { k =>
        writeBatch(src, s"b$k.jsonl",
          s"""{"id": ${k + 1}, "v": "v$k", "updated_at": ${k + 1}}""")
        q.processAllAvailable()
      }
      val m = vt.manifestOf(vt.latestVersion.get)
      assert(m.dataDirs.size <= 2,
        s"pack policy should bound dirs: ${m.dataDirs.size}")
      // the bound came from bin-packing commits, not full compact()s
      assert(vt.history().exists(_.operation == "compact_small"))
      assert(!vt.history().exists(_.operation == "compact"))
      assert(vt.read().count() == 5)
    } finally q.stop()
  }
}
