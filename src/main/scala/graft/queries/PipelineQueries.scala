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
      build = (s, dir) => IssuesFromOrders.issuesSilver(Tables.orders(s, dir))
        .select(explode(col("labels_arr")).as("label"))
        .groupBy("label").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("label")),
      oracle = Some {
        val cases = IssuesFromOrders.labelsByPriority.init.map { case (pr, ls) =>
          s"WHEN '$pr' THEN [${ls.map(l => s"'$l'").mkString(", ")}]"
        }.mkString(" ")
        val last = IssuesFromOrders.labelsByPriority.last._2
          .map(l => s"'$l'").mkString(", ")
        s"""SELECT label, CAST(count(*) AS BIGINT) AS n
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
    )
  )
}
