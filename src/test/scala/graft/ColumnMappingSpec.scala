package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Column-mapping contract (ALTER TABLE RENAME/DROP COLUMN as
  * metadata-only commits): zero data I/O on the DDL itself, reads project
  * the overlay, stats-based pruning keeps working through a rename, every
  * write path accepts logical names, and a dropped column's physical slot
  * is reserved so a re-added column can never resurrect stale bytes.
  */
class ColumnMappingSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("vt_map").resolve("tbl").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "payload", "updated_at")
  }

  test("rename is metadata-only: same data dirs, new name reads, old name gone") {
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((3L, "c", 11L)))
    val dirsBefore = vt.manifestOf(vt.latestVersion.get).dataDirs
    val v = vt.renameColumn("payload", "body")
    val m = vt.manifestOf(v)
    assert(m.dataDirs == dirsBefore) // not one byte of data moved
    assert(m.operation == "rename_column")
    assert(vt.read().columns.toSeq == Seq("id", "body", "updated_at"))
    assert(vt.read().orderBy("id").select("body").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    intercept[org.apache.spark.sql.AnalysisException] {
      vt.read().select("payload").collect()
    }
    assert(vt.tableSchema.get.fieldNames.toSeq == Seq("id", "body", "updated_at"))
  }

  test("time travel across the rename boundary shows each epoch's names") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "a", 10L)))
    val v1 = vt.renameColumn("payload", "body")
    assert(vt.readVersion(v0).columns.contains("payload"))
    assert(vt.readVersion(v1).columns.contains("body"))
  }

  test("pruning survives a rename of the tracked column (logical-name predicates)") {
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((100L, "x", 11L)))
    vt.append(df((200L, "y", 12L)))
    vt.renameColumn("id", "doc_id")
    // dir stats are keyed by the physical name; the logical predicate must
    // still translate into skipping — only the one overlapping dir scans
    val v = vt.latestVersion.get
    assert(vt.manifestOf(v).dataDirs.size == 3)
    assert(vt.skipDirsFor(v, col("doc_id") >= 150L).size == 1)
    assert(vt.readWhere(col("doc_id") >= 150L).collect()
      .map(_.getLong(0)).toSeq == Seq(200L))
    // explicit-bound reader translates the name too
    assert(vt.readRange("doc_id", 99L, 101L).collect().length == 1)
  }

  test("append, merge, update, delete all speak logical names after a rename") {
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("id"))
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.renameColumn("payload", "body")
    // append with logical columns
    import spark.implicits._
    vt.append(Seq((3L, "c", 11L)).toDF("id", "body", "updated_at"))
    assert(vt.read().count() == 3)
    // merge on logical key/order names
    vt.merge(Seq((2L, "b2", 20L), (4L, "d", 20L)).toDF("id", "body", "updated_at"),
      keyCols = Seq("id"), orderCol = "updated_at")
    assert(vt.read().orderBy("id").select("body").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b2", "c", "d"))
    // update assignments + predicate in logical names
    vt.update(col("id") === 1L, Map("body" -> lit("a!")))
    assert(vt.readPoint("id", 1L).select("body").head().getString(0) == "a!")
    // delete with a logical predicate
    vt.delete(col("body") === lit("d"))
    assert(vt.read().count() == 3)
    // the whole sequence preserved the overlay
    assert(vt.read().columns.toSeq == Seq("id", "body", "updated_at"))
  }

  test("drop hides the column; a re-added column gets a FRESH slot (no resurrection)") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "secret1", 10L), (2L, "secret2", 10L)))
    vt.dropColumn("payload")
    assert(vt.read().columns.toSeq == Seq("id", "updated_at"))
    // append without the dropped column works (physical slot null-fills)
    import spark.implicits._
    vt.append(Seq((3L, 11L)).toDF("id", "updated_at"))
    // re-add a column of the SAME logical name: fresh physical slot —
    // the old rows must read NULL, never the dropped bytes
    vt.append(Seq((4L, 12L, "fresh")).toDF("id", "updated_at", "payload"),
      mergeSchema = true)
    val out = vt.read().orderBy("id").select("payload").collect()
    assert(out.map(r => Option(r.getString(0))).toSeq ==
      Seq(None, None, None, Some("fresh")))
    // physical slot really is distinct from the reserved one
    val cm = vt.manifestOf(vt.latestVersion.get).colMap
    assert(cm.exists { case (p, l) => l == "payload" && p != "payload" })
  }

  test("mapping survives fresh handles, checkpoints, compaction, clustering, restore") {
    val root = freshRoot()
    val vt = new VersionedTable(spark, root, statsCols = Seq("id"),
      checkpointInterval = 1)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.append(df((100L, "x", 11L)))
    vt.renameColumn("id", "doc_id")
    // a brand-new handle (checkpoint + manifest parse path)
    val vt2 = VersionedTable(spark, root, statsCols = Seq("id"))
    assert(vt2.read().columns.toSeq == Seq("doc_id", "payload", "updated_at"))
    // physical-space compaction carries the overlay and the skipping index
    vt2.compact()
    assert(vt2.read().columns.head == "doc_id")
    // appends speak the CURRENT logical names — "id" would be a new column
    import spark.implicits._
    vt2.append(Seq((200L, "y", 12L)).toDF("doc_id", "payload", "updated_at"))
    vt2.compactClustered(Seq("doc_id"), nChunks = 2)
    assert(vt2.read().columns.head == "doc_id")
    assert(vt2.readRange("doc_id", 150L, 250L).collect()
      .map(_.getLong(0)).toSeq == Seq(200L))
    // a handle constructed with the NEW logical name in statsCols must
    // land its stats on the same physical key (or pruning silently dies)
    val vt3 = VersionedTable(spark, root, statsCols = Seq("doc_id"))
    vt3.append(df((300L, "z", 13L)).toDF("doc_id", "payload", "updated_at"))
    val v3 = vt3.latestVersion.get
    val newDir = vt3.manifestOf(v3).dataDirs.last
    assert(vt3.manifestOf(v3).stats(newDir).contains("id")) // physical key
    assert(vt3.readRange("doc_id", 299L, 301L).collect()
      .map(_.getLong(0)).toSeq == Seq(300L))
    // restore to the pre-rename version resurrects the old logical name
    val preRename = 1L
    vt3.restore(preRename)
    assert(vt3.read().columns.contains("id"))
  }

  test("change feed across a rename: zero false changes, new names afterward") {
    val vt = VersionedTable(spark, freshRoot())
    val v0 = vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    val v1 = vt.renameColumn("payload", "body")
    // physical identity is stable: the rename alone changes nothing
    assert(vt.changesByKey(v0, v1, Seq("id")).count() == 0)
    import spark.implicits._
    val v2 = vt.merge(Seq((2L, "b2", 20L)).toDF("id", "body", "updated_at"),
      keyCols = Seq("id"), orderCol = "updated_at")
    val ch = vt.changesByKey(v0, v2, Seq("id"))
    assert(ch.columns.contains("body"))
    val types = ch.orderBy("_change_type").select("_change_type", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(types == Seq(("update_postimage", "b2"), ("update_preimage", "b")))
  }

  test("partitioned table: idempotent all-partition rename; new partitions speak the new name") {
    import spark.implicits._
    val root = Files.createTempDirectory("pvt_map").resolve("tbl").toString
    val pvt = new graft.sources.PartitionedVersionedTable(spark, root, "src")
    pvt.overwrite(Seq((1L, "a", "s1", 10L), (2L, "b", "s2", 10L))
      .toDF("id", "payload", "src", "updated_at"))
    pvt.renameColumn("payload", "body")
    assert(pvt.read().columns.toSet == Set("id", "body", "src", "updated_at"))
    // idempotent: a second run (crashed-halfway replay) is a no-op
    pvt.renameColumn("payload", "body")
    // a merge AFTER the rename routes a NEW partition under the new name
    pvt.merge(Seq((3L, "c", "s3", 20L)).toDF("id", "body", "src", "updated_at"),
      keyCols = Seq("id"), orderCol = "updated_at")
    assert(pvt.read().orderBy("id").select("body").collect()
      .map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] { pvt.renameColumn("src", "x") }
  }

  test("streaming upsert keeps flowing into a renamed table") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(Seq((1L, "a", 10L)).toDF("id", "body", "updated_at")
      .withColumnRenamed("body", "payload"))
    vt.renameColumn("payload", "body")
    // the upsert sink's merge speaks the CURRENT logical names
    val batch = Seq((1L, "a2", 20L), (2L, "b", 20L), (2L, "stale", 15L))
      .toDF("id", "body", "updated_at")
    vt.merge(graft.streaming.UpsertSink.latestPerKey(
        batch, Seq("id"), "updated_at", Seq("id")),
      keyCols = Seq("id"), orderCol = "updated_at")
    assert(vt.read().orderBy("id").select("body").collect()
      .map(_.getString(0)).toSeq == Seq("a2", "b"))
  }

  test("rename validation: unknown old name, colliding new name") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    intercept[IllegalArgumentException] { vt.renameColumn("nope", "x") }
    intercept[IllegalArgumentException] { vt.renameColumn("payload", "id") }
    intercept[IllegalArgumentException] { vt.dropColumn("nope") }
  }
}
