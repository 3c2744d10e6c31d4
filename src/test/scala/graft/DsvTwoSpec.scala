package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** DSv2 surface of [[VersionedTable]]: `spark.read.format("graft")` must
  * (a) return exactly what the API read path returns, (b) show the pushed
  * filters at the scan node, and (c) open a file set with the ledger-pruned
  * dirs ABSENT — the skipping machinery reachable from a plain Spark plan.
  */
class DsvTwoSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_dsv2_${name}_${spark.sparkContext.applicationId}"
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  /** Ten disjoint id-decade dirs with id stats — the skipping fixture. */
  private def decadeTable(name: String): VersionedTable = {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(name), statsCols = Seq("id"))
    (0 until 10).foreach { d =>
      val df = (d * 10 until (d + 1) * 10)
        .map(i => (i.toLong, s"name_$i", i * 2.5)).toDF("id", "label", "score")
      if (d == 0) vt.overwrite(df) else vt.append(df)
    }
    vt
  }

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan:\n" +
        df.queryExecution.executedPlan.toString))

  test("delegated parquet scan: filter pushdown prunes dirs out of the file set") {
    val vt = decadeTable("prune")
    val df = spark.read.format("graft").load(vt.root)
      .filter(col("id") >= 35L && col("id") <= 44L)

    // (a) results match the API path exactly
    val api = vt.readWhere(col("id") >= 35L && col("id") <= 44L)
    assert(df.exceptAll(api).isEmpty && api.exceptAll(df).isEmpty)
    assert(df.count() === 10)

    // (b) the executed plan advertises the pushdown at the scan
    val plan = df.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"no pushed filters in plan:\n$plan")

    // (c) the scan's resolved file set is the pruned one: only the two
    // dirs overlapping [35, 44] are opened — 8 of 10 dirs absent
    val scan = scanOf(df).scan.asInstanceOf[graft.sources.GraftRuntimeScan]
      .delegate.asInstanceOf[ParquetScan]
    val files = scan.fileIndex.inputFiles
    assert(files.nonEmpty && files.length < vt.manifestOf(
      vt.latestVersion.get).dataDirs.size,
      s"scan did not prune: ${files.length} files")
    val expected = vt.scanReport(col("id") >= 35L && col("id") <= 44L)
    assert(expected.filter(col("opened")).count() === 2)
    val keptDirs = files.map(f => new Path(f).getParent.toString).distinct
    assert(keptDirs.length === 2, s"expected 2 dirs, got ${keptDirs.mkString(", ")}")
  }

  test("column pruning reaches the parquet ReadSchema") {
    val vt = decadeTable("pruneCols")
    val df = spark.read.format("graft").load(vt.root).select("label")
    val scan = scanOf(df).scan.asInstanceOf[graft.sources.GraftRuntimeScan]
      .delegate.asInstanceOf[ParquetScan]
    assert(scan.readDataSchema.fieldNames.toSeq === Seq("label"))
    assert(df.count() === 100)
  }

  test("unfiltered read equals the API snapshot; aggregates match") {
    val vt = decadeTable("full")
    val df = spark.read.format("graft").load(vt.root)
    assert(df.count() === 100)
    val agg = df.agg(sum("id").cast("long")).head.getLong(0)
    assert(agg === (0L until 100L).sum)
  }

  test("versionAsOf and timestampAsOf pin the snapshot") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot("tt"))
    val v0 = vt.overwrite(Seq((1L, "a")).toDF("id", "label"))
    val t0 = vt.manifestOf(v0).timestampMs
    vt.append(Seq((2L, "b")).toDF("id", "label"))

    val atV0 = spark.read.format("graft").option("versionAsOf", v0.toString)
      .load(vt.root)
    assert(atV0.count() === 1 && atV0.head.getLong(0) === 1L)

    val atT0 = spark.read.format("graft")
      .option("timestampAsOf", t0.toString).load(vt.root)
    assert(atT0.count() === 1)

    assert(spark.read.format("graft").load(vt.root).count() === 2)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("versionAsOf", "99").load(vt.root)
        .count()
    }
  }

  test("column-mapped snapshot falls back to the readWhere path and matches") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot("mapped"), statsCols = Seq("id"))
    vt.overwrite((0L until 50L).map(i => (i, s"v$i")).toDF("id", "label"))
    vt.renameColumn("label", "tag")

    val df = spark.read.format("graft").load(vt.root)
    assert(df.columns.toSeq === Seq("id", "tag"))
    val filtered = df.filter(col("id") < 10L)
    assert(filtered.count() === 10)
    val api = vt.readWhere(col("id") < 10L)
    assert(filtered.exceptAll(api).isEmpty && api.exceptAll(filtered).isEmpty)
    // V1 bridge advertises the pushdown too
    val plan = filtered.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters"), s"plan:\n$plan")
  }

  test("deletion-vector snapshot falls back and filters deleted rows") {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot("dv"))
    vt.overwrite((0L until 50L).map(i => (i, s"v$i")).toDF("id", "label"))
    vt.delete(col("id") % 2 === 0, useDeletionVectors = true)

    val df = spark.read.format("graft").load(vt.root)
    assert(df.count() === 25)
    assert(df.filter(col("id") % 2 === 0).count() === 0)
    val api = vt.read()
    assert(df.exceptAll(api).isEmpty && api.exceptAll(df).isEmpty)
  }

  test("pushdown translation covers the common filter shapes") {
    val fields = Set("a", "b")
    import org.apache.spark.sql.sources._
    val yes = Seq(
      EqualTo("a", 1), GreaterThan("a", 1), LessThanOrEqual("b", "x"),
      In("a", Array(1, 2, 3)), IsNull("a"), IsNotNull("b"),
      StringStartsWith("b", "p"), And(EqualTo("a", 1), IsNotNull("b")),
      Or(EqualTo("a", 1), EqualTo("a", 2)), Not(EqualTo("a", 1)))
    yes.foreach(f => assert(
      graft.sources.GraftDataSource.filterToColumn(f, fields).isDefined,
      s"should translate: $f"))
    val no = Seq(EqualTo("missing", 1),
      And(EqualTo("a", 1), EqualTo("missing", 2)))
    no.foreach(f => assert(
      graft.sources.GraftDataSource.filterToColumn(f, fields).isEmpty,
      s"should NOT translate: $f"))
  }

  test("metadata-only aggregate pushdown: count/min/max answered from the ledger") {
    import spark.implicits._
    // track BOTH columns: count(col)/min(col) resolve only for columns
    // with null + stats ledgers (decadeTable tracks id alone)
    val vt = VersionedTable(spark, freshRoot("aggpush"),
      statsCols = Seq("id", "label"))
    (0 until 10).foreach { d =>
      val df = (d * 10 until (d + 1) * 10)
        .map(i => (i.toLong, s"name_$i", i * 2.5)).toDF("id", "label", "score")
      if (d == 0) vt.overwrite(df) else vt.append(df)
    }
    val df = spark.read.format("graft").load(vt.root)
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), min(col("label")).as("ml"),
        count(col("label")).as("nl"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("GraftLocalScan"),
      s"aggregate not answered metadata-only:\n$plan")
    assert(!plan.contains("BatchScan graft") || plan.contains("GraftLocalScan"),
      s"scan still opened the table:\n$plan")
    val r = df.head
    assert(r.getLong(0) === 100L && r.getLong(1) === 0L && r.getLong(2) === 99L)
    assert(r.getString(3) === "name_0" && r.getLong(4) === 100L)
  }

  test("aggregate pushdown declines under filters, group-bys, and DVs") {
    import spark.implicits._
    val vt = decadeTable("aggdecline")
    // WHERE → residual filter exists → Spark never pushes the agg; the
    // normal scan path must still answer correctly
    val filtered = spark.read.format("graft").load(vt.root)
      .filter(col("id") >= 50L).agg(count(lit(1)))
    assert(filtered.head.getLong(0) === 50L)
    val grouped = spark.read.format("graft").load(vt.root)
      .groupBy(col("id") % 2).agg(count(lit(1)))
    assert(grouped.collect().map(_.getLong(1)).sum === 100L)
    // DV table: metadata count is physical-rows-unsafe → must decline
    // AND still return the logical count through the V1 path
    val dvt = graft.sources.VersionedTable(spark, freshRoot("aggdv"))
    dvt.overwrite((0L until 40L).map(i => (i, s"v$i")).toDF("id", "label"))
    dvt.delete(col("id") % 4 === 0, useDeletionVectors = true)
    val dvCount = spark.read.format("graft").load(dvt.root).agg(count(lit(1)))
    assert(!dvCount.queryExecution.executedPlan.toString.contains("GraftLocalScan"))
    assert(dvCount.head.getLong(0) === 30L)
  }

  test("SQL DELETE and TRUNCATE land on the table protocol") {
    import spark.implicits._
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_dsv2del_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gdel", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdel.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS gdel.t")
    spark.sql("CREATE TABLE gdel.t (id BIGINT, status STRING) USING graft")
    spark.sql("INSERT INTO gdel.t SELECT id, concat('s', id % 3) FROM range(30)")
    spark.sql("DELETE FROM gdel.t WHERE status = 's0'")
    assert(spark.sql("SELECT count(*) FROM gdel.t").head.getLong(0) === 20L)
    assert(spark.sql("SELECT count(*) FROM gdel.t WHERE status = 's0'")
      .head.getLong(0) === 0L)
    // delete is a commit like any other: time travel still sees v2
    assert(spark.sql("SELECT count(*) FROM gdel.t VERSION AS OF 1")
      .head.getLong(0) === 30L)
    spark.sql("TRUNCATE TABLE gdel.t")
    assert(spark.sql("SELECT count(*) FROM gdel.t").head.getLong(0) === 0L)
    spark.sql("DROP TABLE gdel.t")
  }
}
