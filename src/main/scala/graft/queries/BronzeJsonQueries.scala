package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.QueryDef.round6
import graft.operators.Silver

/** Oracle gate for the REAL bronze JSON path (S7 + P1 + P2 + P4): JSON
  * documents are built deterministically from `orders` on BOTH engines,
  * Spark parses them with `from_json(Silver.bronzeSchema)` and runs the real
  * [[Silver.transform]] (nested `labels[*].name` extraction, `pull_request`
  * PR exclusion, `try_to_timestamp` coercion with a malformed branch), and
  * DuckDB re-parses the same strings with its JSON functions
  * (`json_extract`/`json_transform`) — so a regression anywhere in the
  * bronze parse → silver enrich chain breaks the hash (reference
  * `silver.py:143-171`, `ingest.py:112`).
  *
  * Document shape per order (reference bronze field contract, FIXTURES.md §1):
  *   - `created_at` malformed ("not-a-date") when o_orderkey % 11 = 0 →
  *     must coerce to null, not error
  *   - `closed_at` ISO when finalized ('F', +o_orderkey%500 hours), JSON
  *     null otherwise
  *   - `pull_request` present when o_orderkey % 7 = 0 → row excluded
  *   - `labels` array-of-structs per priority, incl. an empty-name entry
  *     that [[Silver.labelNames]] must drop
  */
object BronzeJsonQueries {

  private val iso = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  val defs: Map[String, QueryDef] = Map(

    "pipe_bronze_json" -> QueryDef(
      build = (s, dir) => {
        val pr = col("o_orderpriority")
        val labelsJson =
          when(pr === "1-URGENT", """[{"name":"Bug"},{"name":""},{"name":"Blocker"}]""")
            .when(pr === "2-HIGH", """[{"name":"Bug"},{"name":"Regression"}]""")
            .when(pr === "3-MEDIUM", """[{"name":"Bug"},{"name":"Groupby"}]""")
            .when(pr === "4-NOT SPECIFIED", """[{"name":"Docs"}]""")
            .otherwise("""[{"name":"component: io"},{"name":"Enhancement"}]""")
        val createdStr = when(col("o_orderkey") % 11 === 0, lit("not-a-date"))
          .otherwise(date_format(col("o_orderdate"), iso))
        val closedTs = expr(
          "timestampadd(HOUR, CAST(o_orderkey % 500 AS INT), o_orderdate)")
        val closedFrag = when(col("o_orderstatus") === "F",
          concat(lit(", \"closed_at\": \""), date_format(closedTs, iso), lit("\"")))
          .otherwise(lit(", \"closed_at\": null"))
        val prFrag = when(col("o_orderkey") % 7 === 0,
          lit(", \"pull_request\": {\"url\": \"pr\"}")).otherwise(lit(""))
        val raw = Tables.orders(s, dir).select(concat(
          lit("{\"id\": "), col("o_orderkey"),
          lit(", \"number\": "), col("o_orderkey") % 1000,
          lit(", \"state\": \""),
          when(col("o_orderstatus") === "F", "closed").otherwise("open"),
          lit("\", \"title\": \"issue-"), col("o_orderkey"), lit("\""),
          lit(", \"created_at\": \""), createdStr, lit("\""),
          closedFrag,
          lit(", \"labels\": "), labelsJson,
          prFrag,
          lit("}")).as("raw"))
        // the REAL bronze parse + silver enrichment path
        val bronze = raw
          .select(from_json(col("raw"), Silver.bronzeSchema).as("b"))
          .select("b.*")
        val silver = Silver.transform(Silver.excludePullRequests(bronze))
        round6(silver
          .groupBy("ticket_kind", "priority_tier", "component", "state")
          .agg(
            count(lit(1)).as("n_issues"),
            sum(col("issue_id")).as("sum_id"),
            count(col("created_at")).as("n_created"),
            count(col("closed_at")).as("n_closed"),
            avg(col("resolution_hours")).as("avg_res_hours")))
      },
      oracle = Some(
        """WITH raw AS (
          |  SELECT '{"id": ' || o_orderkey
          |      || ', "number": ' || (o_orderkey % 1000)
          |      || ', "state": "' || CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open' END
          |      || '", "title": "issue-' || o_orderkey || '"'
          |      || ', "created_at": "' || CASE WHEN o_orderkey % 11 = 0 THEN 'not-a-date'
          |           ELSE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') END || '"'
          |      || CASE WHEN o_orderstatus = 'F'
          |           THEN ', "closed_at": "' || strftime(o_orderdate + INTERVAL 1 HOUR * (o_orderkey % 500), '%Y-%m-%dT%H:%M:%SZ') || '"'
          |           ELSE ', "closed_at": null' END
          |      || ', "labels": ' || CASE o_orderpriority
          |           WHEN '1-URGENT' THEN '[{"name":"Bug"},{"name":""},{"name":"Blocker"}]'
          |           WHEN '2-HIGH' THEN '[{"name":"Bug"},{"name":"Regression"}]'
          |           WHEN '3-MEDIUM' THEN '[{"name":"Bug"},{"name":"Groupby"}]'
          |           WHEN '4-NOT SPECIFIED' THEN '[{"name":"Docs"}]'
          |           ELSE '[{"name":"component: io"},{"name":"Enhancement"}]' END
          |      || CASE WHEN o_orderkey % 7 = 0 THEN ', "pull_request": {"url": "pr"}' ELSE '' END
          |      || '}' AS j
          |  FROM orders),
          |bronze AS (
          |  SELECT CAST(json_extract(j, '$.id') AS BIGINT) AS issue_id,
          |         json_extract_string(j, '$.state') AS state,
          |         TRY_CAST(json_extract_string(j, '$.created_at') AS TIMESTAMP) AS created_at,
          |         TRY_CAST(json_extract_string(j, '$.closed_at') AS TIMESTAMP) AS closed_at,
          |         list_filter(
          |           list_transform(json_transform(j->'$.labels', '[{"name":"VARCHAR"}]'),
          |                          x -> x.name),
          |           n -> n IS NOT NULL AND n <> '') AS labels
          |  FROM raw
          |  WHERE json_extract(j, '$.pull_request') IS NULL),
          |silver AS (
          |  SELECT *,
          |         CASE WHEN list_has_any(labels, ['Bug']) THEN 'defect'
          |              WHEN list_has_any(labels, ['Docs']) THEN 'docs'
          |              WHEN list_has_any(labels, ['Enhancement']) THEN 'enhancement'
          |              WHEN list_has_any(labels, ['Usage Question']) THEN 'question'
          |              ELSE 'other' END AS ticket_kind,
          |         CASE WHEN list_has_any(labels, ['Blocker', 'Blocker for rc', 'Segfault']) THEN 'P0'
          |              WHEN list_has_any(labels, ['Regression']) THEN 'P1'
          |              WHEN list_has_any(labels, ['Bug']) THEN 'P2'
          |              ELSE 'NA' END AS priority_tier,
          |         CASE WHEN list_has_any(labels, ['component: io']) THEN 'io'
          |              WHEN list_has_any(labels, ['Groupby']) THEN 'Groupby'
          |              ELSE 'other' END AS component,
          |         (epoch(closed_at) - epoch(created_at)) / 3600.0 AS resolution_hours
          |  FROM bronze)
          |SELECT ticket_kind, priority_tier, component, state,
          |       count(*) AS n_issues,
          |       CAST(sum(issue_id) AS BIGINT) AS sum_id,
          |       count(created_at) AS n_created,
          |       count(closed_at) AS n_closed,
          |       round(avg(resolution_hours), 6) AS avg_res_hours
          |FROM silver
          |GROUP BY 1, 2, 3, 4""".stripMargin)
    )
  )
}
