package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.sources.{DeltaLogExport, VersionedTable}

/** Delta-log export contract: the action chain REPLAYS to the live table —
  * accumulating add/remove per commit file lands on exactly the final
  * snapshot's files, sizes match detail(), the schemaString is the real
  * table schema, and unsupported chains (live DVs) fail loudly instead of
  * exporting a lie.
  */
class DeltaLogExportSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def freshRoot(): String =
    Files.createTempDirectory("dlx_spec").resolve("tbl").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "payload", "updated_at")
  }

  private def logActions(dest: String): Seq[Seq[com.fasterxml.jackson.databind.JsonNode]] = {
    val dir = new java.io.File(s"$dest/_delta_log")
    dir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName)
      .map { f =>
        scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty)
          .map(mapper.readTree).toSeq
      }.toSeq
  }

  private def replayLiveFiles(commits: Seq[Seq[com.fasterxml.jackson.databind.JsonNode]]): Set[String] = {
    val live = scala.collection.mutable.Set.empty[String]
    for (commit <- commits; a <- commit) {
      if (a.has("add")) live += a.get("add").get("path").asText()
      if (a.has("remove")) live -= a.get("remove").get("path").asText()
    }
    live.toSet
  }

  test("export replays to the live snapshot across append/merge/delete/compact") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)))
    vt.append(df((4L, "d", 11L)))
    vt.merge(df((2L, "b2", 20L), (5L, "e", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    vt.delete(col("id") === 1L)
    vt.compact()
    val dest = Files.createTempDirectory("dlx_out").toString
    val idx = DeltaLogExport.export(spark, vt, dest)
    assert(idx == (0L until vt.versions.size.toLong))

    val commits = logActions(dest)
    assert(commits.size == vt.versions.size)

    // v0 carries protocol + metaData; schemaString is the REAL schema
    val first = commits.head
    assert(first.exists(_.has("protocol")))
    val md = first.find(_.has("metaData")).get.get("metaData")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText())
    assert(schema == vt.tableSchema.get)
    assert(md.get("format").get("provider").asText() == "parquet")

    // replayed live set == the final manifest's actual part files
    val live = replayLiveFiles(commits)
    val m = vt.manifestOf(vt.latestVersion.get)
    val expected = m.dataDirs.flatMap { d =>
      new java.io.File(s"$root/$d").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(f => s"$d/${f.getName}")
    }.toSet
    assert(live == expected, s"live=$live expected=$expected")

    // rewrite ops must emit removes (merge rewrote a dir, compact all)
    val removes = commits.flatMap(_.filter(_.has("remove")))
    assert(removes.nonEmpty)

    // replayed sizes == detail().sizeBytes (the metadata-only invariant)
    val sizeByPath = commits.flatten.filter(_.has("add"))
      .map(a => a.get("add").get("path").asText() ->
        a.get("add").get("size").asLong()).toMap
    assert(live.toSeq.map(sizeByPath).sum == vt.detail().sizeBytes)

    // and the replayed files actually read back as the live table
    val paths = live.toSeq.map(p => s"$root/$p")
    val replayed = spark.read.parquet(paths: _*)
    assert(replayed.count() == vt.read().count())
    assert(replayed.exceptAll(vt.read()).isEmpty &&
      vt.read().exceptAll(replayed).isEmpty)
  }

  // the per-version complement of the live-snapshot replay (the Delta
  // analogue of the Iceberg field-id walker): a reader that replays any
  // PREFIX of the exported log must land on that exact version's file
  // set and rows — the cumulative add/remove encoding holds at every
  // commit, not just the last one
  test("prefix replay reconstructs every version's exact file set and rows") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)))
    vt.append(df((4L, "d", 11L)))
    vt.merge(df((2L, "b2", 20L), (5L, "e", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    vt.delete(col("id") === 1L)
    vt.compact()
    val dest = Files.createTempDirectory("dlx_walk").toString
    DeltaLogExport.export(spark, vt, dest)
    val commits = logActions(dest)
    assert(commits.size == vt.versions.size)
    for (k <- vt.versions.indices) {
      val v = vt.versions(k)
      val replayed = replayLiveFiles(commits.take(k + 1))
      val expected = vt.manifestOf(v).dataDirs.flatMap { d =>
        new java.io.File(s"$root/$d").listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
          .map(f => s"$d/${f.getName}")
      }.toSet
      assert(replayed == expected,
        s"log prefix 0..$k drifted from version $v:\n" +
          s"  replayed=$replayed\n  expected=$expected")
      // the replayed file set reads back as exactly that version
      val rows = spark.read.parquet(
        replayed.toSeq.map(p => s"$root/$p"): _*)
      assert(rows.count() == vt.readVersion(v).count(),
        s"log prefix 0..$k row count drifted from version $v")
    }
  }

  test("metaData is re-emitted exactly on schema change") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L)))
    vt.append(df((2L, "b", 11L)))
    vt.append(df((3L, "c", 12L))
      .withColumn("extra", lit(7L)), mergeSchema = true)
    val dest = Files.createTempDirectory("dlx_out").toString
    DeltaLogExport.export(spark, vt, dest)
    val commits = logActions(dest)
    val mdAt = commits.zipWithIndex.collect {
      case (c, i) if c.exists(_.has("metaData")) => i
    }
    assert(mdAt == Seq(0, 2), s"metaData at $mdAt")
    // same table id across re-emissions (and across re-exports)
    val ids = commits.flatten.filter(_.has("metaData"))
      .map(_.get("metaData").get("id").asText()).distinct
    assert(ids.size == 1)
  }

  test("export -> import round-trips: the adopted table reads the original files") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L), (3L, "c", 10L)))
    vt.merge(df((2L, "b2", 20L), (4L, "d", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    vt.delete(col("id") === 3L)
    val dest = Files.createTempDirectory("dlx_rt").toString
    DeltaLogExport.export(spark, vt, dest)
    // make the exported location a self-contained Delta-shaped table:
    // copy the live data dirs next to the log (paths are root-relative)
    val m = vt.manifestOf(vt.latestVersion.get)
    for (d <- m.dataDirs) {
      val src = new java.io.File(s"$root/$d")
      val dst = new java.io.File(s"$dest/$d")
      dst.mkdirs()
      src.listFiles().filter(_.isFile).foreach { f =>
        Files.copy(f.toPath, new java.io.File(dst, f.getName).toPath)
      }
    }
    val imported = DeltaLogExport.importSnapshot(spark, dest,
      Files.createTempDirectory("dlx_imp").resolve("tbl").toString)
    assert(imported.latestVersion.contains(0L))
    assert(imported.history().head.operation == "convert_from_delta")
    assert(imported.tableSchema.get == vt.tableSchema.get)
    val a = imported.read()
    val b = vt.read()
    assert(a.count() == b.count() && a.exceptAll(b).isEmpty &&
      b.exceptAll(a).isEmpty)
    // metadata-only: the import wrote no parquet of its own
    assert(imported.detail().sizeBytes == vt.detail().sizeBytes)
  }

  test("live deletion vectors refuse to export") {
    val root = freshRoot()
    val vt = VersionedTable(spark, root)
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    vt.delete(col("id") === 1L, useDeletionVectors = true)
    val dest = Files.createTempDirectory("dlx_out").toString
    intercept[UnsupportedOperationException] {
      DeltaLogExport.export(spark, vt, dest)
    }
  }
}
