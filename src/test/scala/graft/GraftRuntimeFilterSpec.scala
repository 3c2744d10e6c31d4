package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{GraftRuntimeScan, VersionedTable}

/** DSv2 runtime filtering (SupportsRuntimeV2Filtering): joining the
  * governed table against a filtered dimension must hand the build side's
  * join keys to the scan BEFORE input partitions plan, re-pruning the file
  * set through the manifest ledgers — dynamic file skipping, the DSv2
  * analogue of dynamic partition pruning.
  */
class GraftRuntimeFilterSpec extends SparkSpec {

  private def freshRoot(name: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_rtf_${name}_${spark.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    root
  }

  /** 100 rows in 10 id-banded dirs (ids d*10 .. d*10+9), id stats tracked. */
  private def decadeTable(name: String): VersionedTable = {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(name), statsCols = Seq("id"))
    (0 until 10).foreach { d =>
      val band = (d * 10 until (d + 1) * 10)
        .map(i => (i.toLong, s"r$i")).toDF("id", "label")
      if (d == 0) vt.overwrite(band) else vt.append(band)
    }
    vt
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[BatchScanExec] =
    graft.plans.PlanScans.batchScans(df.queryExecution.executedPlan)

  test("join against a filtered dim runtime-prunes the fact file set") {
    import spark.implicits._
    val vt = decadeTable("dpp")
    // dim: parquet-backed with a SELECTIVE filter (DPP requires one on the
    // build side); the filtered keys all land in ONE band, so the runtime
    // IN-envelope must drop 9/10 dirs
    val dimPath = freshRoot("dppdim")
    ((30L to 34L).map(i => (i, "pick")) ++ (900L to 960L).map(i => (i, "skip")))
      .toDF("d_id", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "pick")
    val fact = spark.read.format("graft").load(vt.root)
    val joined = fact.join(broadcast(dim), col("id") === col("d_id"))
      .select(col("id"), col("label"), col("tag"))
    val rows = joined.collect()
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).sorted.toSeq === (30L to 34L))
    // the executed plan carries a runtime (dynamic pruning) filter on the scan
    val scans = scansOf(joined).filter(
      _.scan.isInstanceOf[GraftRuntimeScan])
    assert(scans.nonEmpty, "no graft BatchScan in the executed plan")
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      s"no runtime filter reached the graft scan:\n${joined.queryExecution.executedPlan}")
    // and the filter actually re-pruned: the delegate's file set shrank
    val opened = scans.head.scan.asInstanceOf[GraftRuntimeScan].delegate
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .fileIndex.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
      .distinct.length
    val total = vt.manifestOf(vt.latestVersion.get).dataDirs.size
    assert(opened < total, s"runtime filter did not prune: $opened of $total dirs")
    assert(opened <= 2, s"expected <=2 dirs after runtime pruning, got $opened")
  }

  test("static pushdown and runtime filters compose") {
    import spark.implicits._
    val vt = decadeTable("both")
    val dimPath = freshRoot("bothdim")
    Seq((35L, "x"), (36L, "x"), (95L, "x"), (7L, "z"))
      .toDF("d_id", "tag").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "x")
    val fact = spark.read.format("graft").load(vt.root)
      .filter(col("id") < 50L) // static: drops bands 5..9
    val joined = fact.join(broadcast(dim), col("id") === col("d_id"))
    assert(joined.collect().length === 2) // 95 cut by the static filter
    val scans = scansOf(joined).filter(_.scan.isInstanceOf[GraftRuntimeScan])
    if (scans.exists(_.runtimeFilters.nonEmpty)) {
      val opened = scans.head.scan.asInstanceOf[GraftRuntimeScan].delegate
        .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
        .fileIndex.inputFiles
        .map(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
        .distinct.length
      assert(opened <= 2, s"composed pruning opened $opened dirs")
    }
  }

  test("unfiltered scan reports exact ledger row count to the planner") {
    val vt = decadeTable("stats")
    val df = spark.read.format("graft").load(vt.root)
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(100)),
      s"expected exact ledger rowCount=100, got ${stats.rowCount}")
    assert(stats.sizeInBytes > 0 && stats.sizeInBytes < Long.MaxValue / 4,
      s"size estimate unusable for broadcast planning: ${stats.sizeInBytes}")
  }

  test("pushed LIMIT bounds the file list from the row ledger") {
    val vt = decadeTable("limit")
    val df = spark.read.format("graft").load(vt.root).limit(15)
    assert(df.collect().length === 15)
    val scans = scansOf(df).filter(_.scan.isInstanceOf[GraftRuntimeScan])
    assert(scans.nonEmpty, "no graft BatchScan under the limit")
    val scan = scans.head.scan.asInstanceOf[GraftRuntimeScan]
    assert(scan.description().contains("PushedLimit: 15"), scan.description())
    val opened = scan.delegate
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .fileIndex.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent.toString)
      .distinct.length
    assert(opened === 2,
      s"LIMIT 15 over 10-row-per-dir ledgers must open 2 dirs, got $opened")

    // a residual filter voids the bound: rows stay correct, every
    // filter-surviving dir scans
    val filtered = spark.read.format("graft").load(vt.root)
      .filter(col("id") === 37L).limit(1)
    assert(filtered.collect().map(_.getLong(0)).toSeq === Seq(37L))
  }

  test("filterAttributes reports only ledger-tracked columns") {
    import spark.implicits._
    val vt = decadeTable("attrs")
    val df = spark.read.format("graft").load(vt.root)
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head.scan.asInstanceOf[GraftRuntimeScan]
    assert(scan.filterAttributes().map(_.fieldNames.head).toSeq === Seq("id"))
  }
}
