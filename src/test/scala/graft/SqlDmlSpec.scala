package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** SQL-text UPDATE / MERGE INTO over graft tables (GraftSqlDml): both must
  * land on the table's copy-on-write commit protocol — new manifest
  * version, dir-grained rewrite, history intact — and match the same
  * operation done through the API.
  */
class SqlDmlSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_dml_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gdml", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdml.warehouse", w)
    w
  }

  private def freshTable(name: String): VersionedTable = {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS gdml.$name")
    spark.sql(s"CREATE TABLE gdml.$name (id BIGINT, price BIGINT, status STRING) USING graft")
    import spark.implicits._
    Seq((1L, 100L, "a"), (2L, 200L, "b"), (3L, 300L, "a"), (4L, 400L, "c"))
      .toDF("id", "price", "status")
      .createOrReplaceTempView(s"${name}_seed")
    spark.sql(s"INSERT INTO gdml.$name SELECT * FROM ${name}_seed")
    VersionedTable(spark, s"$warehouse/$name")
  }

  test("SQL UPDATE rewrites matched rows, keeps history") {
    val vt = freshTable("t_upd")
    spark.sql("UPDATE gdml.t_upd SET price = price + 5, status = 'x' WHERE id % 2 = 0")
    val rows = spark.sql("SELECT id, price, status FROM gdml.t_upd ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows === Array((1L, 100L, "a"), (2L, 205L, "x"),
      (3L, 300L, "a"), (4L, 405L, "x")))
    // history: the pre-update snapshot is still readable
    assert(vt.manifestOf(vt.latestVersion.get).operation === "update")
    assert(spark.sql("SELECT sum(price) FROM gdml.t_upd VERSION AS OF 1")
      .head.getLong(0) === 1000L)
  }

  test("SQL UPDATE without WHERE touches every row") {
    freshTable("t_updall")
    spark.sql("UPDATE gdml.t_updall SET price = 0")
    assert(spark.sql("SELECT sum(price) FROM gdml.t_updall").head.getLong(0) === 0L)
  }

  test("SQL MERGE INTO: all three arms in declared-order clause semantics") {
    val vt = freshTable("t_mrg")
    import spark.implicits._
    // source: id 2 (update), id 3 (delete via first-clause), id 9 (insert)
    Seq((2L, 999L, "u"), (3L, 1L, "d"), (9L, 900L, "n"))
      .toDF("sid", "sprice", "sstatus").createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO gdml.t_mrg t USING mrg_src s ON t.id = s.sid
                |WHEN MATCHED AND s.sstatus = 'd' THEN DELETE
                |WHEN MATCHED THEN UPDATE SET price = s.sprice, status = s.sstatus
                |WHEN NOT MATCHED THEN INSERT (id, price, status) VALUES (s.sid, s.sprice, s.sstatus)
                |WHEN NOT MATCHED BY SOURCE AND t.status = 'c' THEN UPDATE SET status = 'z'
                |""".stripMargin)
    val rows = spark.sql("SELECT id, price, status FROM gdml.t_mrg ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows === Array(
      (1L, 100L, "a"),      // untouched (no source match, status != 'c')
      (2L, 999L, "u"),      // matched update
      // 3 deleted
      (4L, 400L, "z"),      // not-matched-by-source update
      (9L, 900L, "n")))     // inserted
    assert(vt.manifestOf(vt.latestVersion.get).operation === "merge_into")
  }

  test("SQL MERGE INTO: NOT MATCHED BY SOURCE DELETE syncs the table") {
    freshTable("t_sync")
    import spark.implicits._
    Seq((1L, 111L), (9L, 900L)).toDF("sid", "sprice")
      .createOrReplaceTempView("sync_src")
    spark.sql("""MERGE INTO gdml.t_sync t USING sync_src s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET price = s.sprice
                |WHEN NOT MATCHED THEN INSERT (id, price, status) VALUES (s.sid, s.sprice, 's')
                |WHEN NOT MATCHED BY SOURCE THEN DELETE
                |""".stripMargin)
    val rows = spark.sql("SELECT id, price FROM gdml.t_sync ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows === Array((1L, 111L), (9L, 900L)))
  }

  test("NOT-MATCHED-BY-SOURCE-only MERGE never duplicates multi-matched rows") {
    freshTable("t_nmbs")
    import spark.implicits._
    // id 2 matches TWO source rows; with no matched clause that must NOT
    // fan the target row out into duplicates
    Seq((2L, 1L), (2L, 2L)).toDF("sid", "sprice")
      .createOrReplaceTempView("nmbs_src")
    spark.sql("""MERGE INTO gdml.t_nmbs t USING nmbs_src s ON t.id = s.sid
                |WHEN NOT MATCHED BY SOURCE AND t.status = 'c' THEN DELETE
                |""".stripMargin)
    val rows = spark.sql("SELECT id FROM gdml.t_nmbs ORDER BY id")
      .collect().map(_.getLong(0))
    assert(rows === Array(1L, 2L, 3L)) // id 4 ('c') deleted, id 2 ONCE
  }

  test("SQL MERGE INTO fails on a cardinality violation") {
    freshTable("t_card")
    import spark.implicits._
    Seq((2L, 1L), (2L, 2L)).toDF("sid", "sprice")
      .createOrReplaceTempView("card_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gdml.t_card t USING card_src s ON t.id = s.sid
                  |WHEN MATCHED THEN UPDATE SET price = s.sprice
                  |""".stripMargin)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("cardinality")),
      s"expected a cardinality violation, got: $e")
  }

  test("mergeInto API: insert-only merge appends without rewriting dirs") {
    val vt = freshTable("t_insonly")
    import spark.implicits._
    val dirsBefore = vt.manifestOf(vt.latestVersion.get).dataDirs.toSet
    val src = Seq((9L, 900L, "n"), (2L, 999L, "u"))
      .toDF("sid", "sprice", "sstatus")
    vt.mergeInto(src, col("id") === col("sid"),
      notMatched = Seq(VersionedTable.MergeIntoInsert(None, Map(
        "id" -> col("sid"), "price" -> col("sprice"), "status" -> col("sstatus")))))
    val m = vt.manifestOf(vt.latestVersion.get)
    assert(dirsBefore.subsetOf(m.dataDirs.toSet),
      "insert-only merge must not rewrite existing dirs")
    assert(vt.read().count() === 5) // id 2 matched -> not inserted
  }

  test("SQL DML on a mapped table (post-rename) stays correct") {
    val vt = freshTable("t_map")
    spark.sql("ALTER TABLE gdml.t_map RENAME COLUMN price TO amount")
    spark.sql("UPDATE gdml.t_map SET amount = amount * 2 WHERE id = 1")
    import spark.implicits._
    Seq((4L, 1L, "m"), (7L, 700L, "n")).toDF("sid", "samount", "sstatus")
      .createOrReplaceTempView("map_src")
    spark.sql("""MERGE INTO gdml.t_map t USING map_src s ON t.id = s.sid
                |WHEN MATCHED THEN UPDATE SET amount = s.samount
                |WHEN NOT MATCHED THEN INSERT (id, amount, status) VALUES (s.sid, s.samount, s.sstatus)
                |""".stripMargin)
    val rows = spark.sql("SELECT id, amount FROM gdml.t_map ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows === Array((1L, 200L), (2L, 200L), (3L, 300L), (4L, 1L), (7L, 700L)))
    assert(vt.read().columns.toSeq === Seq("id", "amount", "status"))
  }

  test("mergeInto releases its checkpointed source storage") {
    val vt = freshTable("t_unpersist")
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (0 until 3).foreach { i =>
      vt.mergeIntoRetrying(
        Seq((1L, 1000L + i, "m")).toDF("sid", "sprice", "sstatus"),
        col("id") === col("sid"),
        matched = Seq(VersionedTable.MergeIntoUpdate(None,
          Map("price" -> col("sprice")))))
    }
    assert(vt.read().filter(col("id") === 1L).head.getLong(1) === 1002L)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"merge must unpersist its checkpointed source; leaked RDD ids: $leaked")
  }
}
