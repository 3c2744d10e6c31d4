package graft

import graft.sources.VersionedTable

/** CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT through the graft
  * catalog — the SQL-text way to materialize a query as a governed table.
  */
class GraftCtasSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = s"${System.getProperty("java.io.tmpdir")}/graft_ctas_${spark.sparkContext.applicationId}"
    spark.conf.set("spark.sql.catalog.gctas", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gctas.warehouse", w)
    w
  }

  test("CTAS materializes the query as a governed table") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gctas.t1")
    spark.sql("""CREATE TABLE gctas.t1 USING graft AS
                |SELECT id, id * 2 AS dbl FROM range(10)""".stripMargin)
    assert(spark.sql("SELECT count(*), sum(dbl) FROM gctas.t1")
      .head.toSeq === Seq(10L, 90L))
    val vt = VersionedTable(spark, s"$warehouse/t1")
    assert(vt.versions.nonEmpty)
  }

  test("RTAS replaces content and schema") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gctas.t2")
    spark.sql("CREATE TABLE gctas.t2 USING graft AS SELECT id FROM range(5)")
    spark.sql("""REPLACE TABLE gctas.t2 USING graft AS
                |SELECT id, 'x' AS tag FROM range(3)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gctas.t2").head.getLong(0) === 3)
    assert(spark.table("gctas.t2").columns.toSeq === Seq("id", "tag"))
  }

  test("CREATE OR REPLACE TABLE AS SELECT works on an existing table") {
    warehouse
    spark.sql("DROP TABLE IF EXISTS gctas.t3")
    spark.sql("CREATE TABLE gctas.t3 USING graft AS SELECT id FROM range(5)")
    spark.sql("""CREATE OR REPLACE TABLE gctas.t3 USING graft AS
                |SELECT id + 100 AS id FROM range(2)""".stripMargin)
    assert(spark.sql("SELECT sum(id) FROM gctas.t3").head.getLong(0) === 201L)
  }
}
