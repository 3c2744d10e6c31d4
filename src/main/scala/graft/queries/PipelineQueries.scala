package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.QueryDef.round6
import graft.operators.{Gold, IssuesFromOrders}

/** End-to-end pipeline queries: the reference's silver rule engine + gold KPI
  * marts, driven by the deterministic orders→issues derivation so DuckDB can
  * oracle every stage (see [[IssuesFromOrders]]).
  */
object PipelineQueries {

  private val cte = IssuesFromOrders.oracleSilverCte

  /** The label-descriptions fixture behind pipe_label_catalog's J1 join:
    * covers a SUBSET of the orders-derived label vocabulary (Blocker,
    * Groupby, Enhancement stay description-less → "") plus one label
    * absent from the data ("Needs Triage", must not surface through the
    * left join). One entry ships a null description (→ "" like the
    * reference's `or ""`).
    */
  private[queries] val labelDescriptionsFixture: Seq[(String, String)] = Seq(
    "Bug" -> "Something isn't working",
    "Docs" -> "Improvements or additions to documentation",
    "Regression" -> "Functionality that used to work in a prior release",
    "component: io" -> "", // null description in the page fixture
    "Needs Triage" -> "Issue that has not been reviewed by a maintainer")

  /** Write the fixture as paged `page_N.jsonl` files (3 + 2 items at
    * per_page=3: a full page, then a short page that ends the walk) under
    * a per-applicationId tmp dir, so the declared query drives the REAL
    * pagination loop, not a literal DataFrame.
    */
  private def writeLabelPages(s: org.apache.spark.sql.SparkSession): String = {
    val dir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_label_pages_${s.sparkContext.applicationId}")
    java.nio.file.Files.createDirectories(dir)
    def obj(l: String, d: String): String = {
      val desc = if (d.isEmpty) "null" else s""""${d.replace("\"", "\\\"")}""""
      s"""{"name": "$l", "description": $desc, "color": "ededed"}"""
    }
    labelDescriptionsFixture.map { case (l, d) => obj(l, d) }
      .grouped(3).zipWithIndex.foreach { case (page, i) =>
        java.nio.file.Files.write(dir.resolve(s"page_$i.jsonl"),
          page.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    dir.toString
  }

  private val shareCols =
    Seq(24, 72, 168, 336).map(b => s"share_closed_within_${b}h")
  private val metricCols =
    Seq("avg_resolution_hours", "median_resolution_hours",
      "p90_resolution_hours") ++ shareCols

  /** CTEs shared by both gold oracles — mirrors [[Gold]] stage by stage. */
  private val goldCtes: String = {
    val bucketAggs = Seq(24, 72, 168, 336).map(b =>
      s"         avg(CASE WHEN resolution_hours <= $b THEN 1.0 ELSE 0.0 END) AS share_closed_within_${b}h").mkString(",\n")
    s"""$cte,
       |defects AS (SELECT * FROM silver WHERE ticket_kind = 'defect'),
       |created_kpi AS (
       |  SELECT strftime(created_at, '%Y-%m') AS month, component, priority_tier,
       |         count(issue_id) AS created_count
       |  FROM defects WHERE created_at IS NOT NULL
       |  GROUP BY 1, 2, 3
       |),
       |closed_kpi AS (
       |  SELECT strftime(closed_at, '%Y-%m') AS month, component, priority_tier,
       |         count(issue_id) AS closed_count,
       |         avg(resolution_hours) AS avg_resolution_hours,
       |         quantile_cont(resolution_hours, 0.5) AS median_resolution_hours,
       |         quantile_cont(resolution_hours, 0.9) AS p90_resolution_hours,
       |$bucketAggs
       |  FROM defects WHERE closed_at IS NOT NULL AND created_at IS NOT NULL
       |  GROUP BY 1, 2, 3
       |),
       |merged AS (
       |  SELECT month, component, priority_tier,
       |         CAST(coalesce(created_count, 0) AS BIGINT) AS created_count,
       |         CAST(coalesce(closed_count, 0) AS BIGINT) AS closed_count,
       |         ${metricCols.mkString(", ")}
       |  FROM created_kpi FULL JOIN closed_kpi USING (month, component, priority_tier)
       |),
       |mart AS (
       |  SELECT *,
       |         CAST(sum(created_count) OVER w - sum(closed_count) OVER w AS BIGINT) AS backlog_end
       |  FROM merged
       |  WINDOW w AS (PARTITION BY component, priority_tier ORDER BY month
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)""".stripMargin
  }

  private def roundedMetrics: String =
    metricCols.map(m => s"round($m, 6) AS $m").mkString(", ")

  val defs: Map[String, QueryDef] = Map(

    "pipe_silver_enrich" -> QueryDef(
      build = (s, dir) => IssuesFromOrders.issuesSilver(Tables.orders(s, dir))
        .select("issue_id", "ticket_kind", "priority_tier", "component",
          "resolution_hours"),
      oracle = Some(
        s"""$cte
           |SELECT issue_id, ticket_kind, priority_tier, component, resolution_hours
           |FROM silver""".stripMargin)
    ),

    "pipe_label_catalog" -> QueryDef(
      // A1 + J1 with a REAL description dimension: fixture label pages go
      // through the page-number fetch loop (reference silver.py:20-38,
      // per_page=3 → two pages, short page ends the walk), then broadcast
      // left-join the counts — matched labels carry their description,
      // unmatched ""; dim-only labels must NOT appear (left direction).
      build = (s, dir) => {
        val pages = writeLabelPages(s)
        val dim = graft.sources.Lakehouse.labelDescriptions(s, pages, perPage = 3)
        IssuesFromOrders.issuesSilver(Tables.orders(s, dir))
          .select(explode(col("labels_arr")).as("label"))
          .groupBy("label").agg(count(lit(1)).as("n"))
          .join(broadcast(dim), Seq("label"), "left")
          .na.fill("", Seq("description"))
          .orderBy(desc("n"), col("label"))
      },
      oracle = Some {
        val cases = IssuesFromOrders.labelsByPriority.init.map { case (pr, ls) =>
          s"WHEN '$pr' THEN [${ls.map(l => s"'$l'").mkString(", ")}]"
        }.mkString(" ")
        val last = IssuesFromOrders.labelsByPriority.last._2
          .map(l => s"'$l'").mkString(", ")
        val descCases = labelDescriptionsFixture.map { case (l, d) =>
          s"WHEN '${l.replace("'", "''")}' THEN '${d.replace("'", "''")}'"
        }.mkString(" ")
        s"""SELECT label, CAST(count(*) AS BIGINT) AS n,
           |       CASE label $descCases ELSE '' END AS description
           |FROM (SELECT unnest(CASE o_orderpriority $cases ELSE [$last] END) AS label
           |      FROM orders) t
           |GROUP BY label""".stripMargin
      }
    ),

    "pipe_gold_component_tier" -> QueryDef(
      build = (s, dir) => round6(
        Gold.buildMarts(IssuesFromOrders.issuesSilver(Tables.orders(s, dir)))
          .componentTier),
      oracle = Some(
        s"""$goldCtes
           |SELECT month, component, priority_tier, created_count, closed_count,
           |       $roundedMetrics, backlog_end
           |FROM mart""".stripMargin),
      headline = true
    ),

    "pipe_gold_global" -> QueryDef(
      build = (s, dir) => round6(
        Gold.buildMarts(IssuesFromOrders.issuesSilver(Tables.orders(s, dir)))
          .global),
      oracle = Some {
        val weighted = metricCols.map(m =>
          s"         sum($m * closed_count) / nullif(sum(closed_count), 0) AS $m")
          .mkString(",\n")
        s"""$goldCtes,
           |counts AS (
           |  SELECT month, CAST(sum(created_count) AS BIGINT) AS created_count,
           |         CAST(sum(closed_count) AS BIGINT) AS closed_count,
           |         CAST(sum(backlog_end) AS BIGINT) AS backlog_end
           |  FROM mart GROUP BY month
           |),
           |weighted AS (
           |  SELECT month,
           |$weighted
           |  FROM closed_kpi GROUP BY month
           |)
           |SELECT month, created_count, closed_count, backlog_end, $roundedMetrics
           |FROM counts LEFT JOIN weighted USING (month)""".stripMargin
      },
      headline = true
    ),

    // declarative data-quality expectations ([[graft.operators
    // .Expectations]]): named predicates audited in ONE aggregate scan
    // (a conditional sum per rule, never a pass per rule), null = fail —
    // the bronze→silver quality gate with the failing rows quarantined,
    // not dropped. The build self-gates the split invariant (clean +
    // quarantine = total); the audit counts replay as plain CASE sums.
    "pipe_expectations" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.operators.Expectations
        import graft.operators.Expectations.Rule
        val orders = Tables.orders(s, dir)
        val rules = Seq(
          Rule("price_positive", col("o_totalprice") > 0),
          Rule("price_bounded", col("o_totalprice") <= 400000),
          Rule("priority_wellformed", col("o_orderpriority").rlike("^[1-5]-")),
          Rule("status_known", col("o_orderstatus").isin("O", "F", "P")))
        val (clean, quarantine) = Expectations.split(orders, rules)
        val (nc, nq, nt) = (clean.count(), quarantine.count(), orders.count())
        require(nc + nq == nt, s"split must partition: $nc + $nq != $nt")
        Expectations.audit(orders, rules)
      },
      oracle = Some {
        val cases = Seq(
          "price_positive" -> "o_totalprice > 0",
          "price_bounded" -> "o_totalprice <= 400000",
          "priority_wellformed" -> "regexp_matches(o_orderpriority, '^[1-5]-')",
          "status_known" -> "o_orderstatus IN ('O', 'F', 'P')")
        cases.map { case (name, pred) =>
          s"""SELECT '$name' AS rule, count(*) AS n_rows,
             |       CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
             |       CAST(sum(CASE WHEN $pred THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
             |FROM orders""".stripMargin
        }.mkString("\nUNION ALL\n")
      }
    )
  )
}
