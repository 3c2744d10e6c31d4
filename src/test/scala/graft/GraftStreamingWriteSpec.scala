package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** DSv2 streaming write — `writeStream.toTable("cat.t")`: executor-written
  * staged parquet adopted into ledgered commits, exactly-once per epoch.
  */
class GraftStreamingWriteSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_sw_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gsw", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsw.warehouse", w)
    w
  }

  private def ckpt(name: String): String = {
    val p = s"$warehouse/_ckpt_$name"
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    p
  }

  test("toTable streams into a catalog table with the exactly-once ledger") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src")
    spark.sql("CREATE TABLE gsw.src (id BIGINT, d DATE, v STRING) USING graft")
    spark.sql("INSERT INTO gsw.src VALUES (1, DATE'2024-01-01', 'a'), (2, DATE'2024-02-01', 'b')")
    spark.sql("DROP TABLE IF EXISTS gsw.dst")
    spark.sql("CREATE TABLE gsw.dst (id BIGINT, d DATE, v STRING, flag BOOLEAN) USING graft")
    val q = spark.readStream.table("gsw.src")
      .withColumn("flag", col("id") % 2 === 0)
      .writeStream.option("checkpointLocation", ckpt("dst"))
      .toTable("gsw.dst")
    try {
      q.processAllAvailable()
      spark.sql("INSERT INTO gsw.src VALUES (3, DATE'2024-03-01', 'c')")
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql("SELECT id, d, v, flag FROM gsw.dst ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getDate(1).toString).toSeq ===
      Seq("2024-01-01", "2024-02-01", "2024-03-01"))
    assert(rows.map(_.getBoolean(3)).toSeq === Seq(false, true, false))
    val vt = VersionedTable(spark, s"$warehouse/dst")
    val ops = vt.versions.map(v => vt.manifestOf(v).operation).drop(1) // v0 = CREATE
    assert(ops.nonEmpty && ops.forall(_.startsWith("stream_append:")), ops)
    // staging fully cleaned up after the epochs committed — including the
    // per-query parent dirs
    val staging = new org.apache.hadoop.fs.Path(s"$warehouse/dst/_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(staging) || fs.listStatus(staging).isEmpty,
      "per-query staging dirs must be removed once their epochs commit")
  }

  test("query column order is projected into the committed physical order") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src5")
    spark.sql("CREATE TABLE gsw.src5 (id BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO gsw.src5 VALUES (7, 'z')")
    spark.sql("DROP TABLE IF EXISTS gsw.dst5")
    spark.sql("CREATE TABLE gsw.dst5 (id BIGINT, v STRING) USING graft")
    // the stream frame REVERSES the column order; the writer must project
    // back to committed order before bytes hit parquet
    val q = spark.readStream.table("gsw.src5").select(col("v"), col("id"))
      .writeStream.option("checkpointLocation", ckpt("dst5")).toTable("gsw.dst5")
    try q.processAllAvailable() finally q.stop()
    assert(spark.sql("SELECT id, v FROM gsw.dst5").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq === Seq((7L, "z")))
    // the adopted FILE itself carries committed order (physical invariant)
    val vt = VersionedTable(spark, s"$warehouse/dst5")
    val dir = vt.manifestOf(vt.latestVersion.get).dataDirs.last
    val file = spark.read.parquet(s"$warehouse/dst5/$dir")
    assert(file.schema.fieldNames.toSeq === Seq("id", "v"),
      s"adopted file order was ${file.schema.fieldNames.mkString(",")}")
  }

  test("mergeSchema option evolves the table additively on the v2 route") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src6")
    spark.sql("CREATE TABLE gsw.src6 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gsw.src6 SELECT id FROM range(3)")
    val sinkRoot = s"$warehouse/evolve_sink"
    import spark.implicits._
    val base = VersionedTable(spark, sinkRoot)
    base.overwrite(Seq((100L, "old")).toDF("id", "note").select(col("id")))
    val q = spark.readStream.table("gsw.src6")
      .withColumn("extra", col("id") * 10)
      .writeStream.format("graft")
      .option("mergeSchema", "true")
      .option("checkpointLocation", ckpt("evolve"))
      .option("path", sinkRoot).start()
    try q.processAllAvailable() finally q.stop()
    val out = base.read()
    assert(out.columns.toSeq === Seq("id", "extra"))
    assert(out.count() === 4) // 1 pre-existing + 3 streamed
    assert(out.filter(col("extra").isNull).count() === 1) // the old row
  }

  test("restart from the checkpoint replays nothing and follows new commits") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src2")
    spark.sql("CREATE TABLE gsw.src2 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gsw.src2 SELECT id FROM range(5)")
    spark.sql("DROP TABLE IF EXISTS gsw.dst2")
    spark.sql("CREATE TABLE gsw.dst2 (id BIGINT) USING graft")
    val c = ckpt("dst2")
    def start() = spark.readStream.table("gsw.src2")
      .writeStream.option("checkpointLocation", c).toTable("gsw.dst2")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    spark.sql("INSERT INTO gsw.src2 SELECT id FROM range(5, 8)")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.sql("SELECT count(*), sum(id) FROM gsw.dst2").head.toSeq ===
      Seq(8L, (0L until 8L).sum))
  }

  test("ledger stats flow through: post-stream count answers metadata-only") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src3")
    spark.sql("CREATE TABLE gsw.src3 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gsw.src3 SELECT id FROM range(7)")
    spark.sql("DROP TABLE IF EXISTS gsw.dst3")
    spark.sql("CREATE TABLE gsw.dst3 (id BIGINT) USING graft")
    val q = spark.readStream.table("gsw.src3")
      .writeStream.option("checkpointLocation", ckpt("dst3")).toTable("gsw.dst3")
    try q.processAllAvailable() finally q.stop()
    val cnt = spark.sql("SELECT count(*) FROM gsw.dst3")
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      "adopted-dir row ledger did not answer the count metadata-only")
    assert(cnt.head.getLong(0) === 7L)
  }

  test("Complete output mode is rejected") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gsw.src4")
    spark.sql("CREATE TABLE gsw.src4 (id BIGINT) USING graft")
    spark.sql("INSERT INTO gsw.src4 SELECT id FROM range(3)")
    spark.sql("DROP TABLE IF EXISTS gsw.dst4")
    spark.sql("CREATE TABLE gsw.dst4 (id BIGINT, n BIGINT) USING graft")
    val e = intercept[Exception] {
      val q = spark.readStream.table("gsw.src4")
        .groupBy("id").agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt("dst4")).toTable("gsw.dst4")
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("Append output mode only") ||
      m.contains("does not support Complete") || m.contains("TRUNCATE")),
      e.toString)
  }
}
