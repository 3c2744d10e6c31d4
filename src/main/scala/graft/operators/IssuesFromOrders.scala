package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic derivation of an issue-shaped silver table from the driver's
  * `orders` test table, so the ENTIRE silver rule engine + gold KPI pipeline
  * is exercised end-to-end against a DuckDB oracle on shared inputs.
  *
  * Mapping (pure, engine-agnostic):
  *   - issue_id    = o_orderkey
  *   - created_at  = o_orderdate
  *   - closed_at   = o_orderdate + (floor(o_totalprice) % 500) hours, only
  *                   for finalized orders (o_orderstatus = 'F'); else open
  *   - labels      = per o_orderpriority, chosen to hit every rule branch:
  *       1-URGENT        → [Bug, Blocker]          → defect / P0 / other
  *       2-HIGH          → [Bug, Regression]       → defect / P1 / other
  *       3-MEDIUM        → [Bug, Groupby]          → defect / P2 / Groupby
  *       4-NOT SPECIFIED → [Docs]                  → docs   / NA / other
  *       5-LOW           → [component: io, Enhancement]
  *                                                 → enhancement / NA / io
  *
  * The labels go through the REAL rule engine ([[Silver.ticketKind]] etc.);
  * the oracle SQL replicates the expected classification with CASE — so a
  * regression in any rule expression breaks the hash match.
  */
object IssuesFromOrders {

  val labelsByPriority: Seq[(String, Seq[String])] = Seq(
    "1-URGENT" -> Seq("Bug", "Blocker"),
    "2-HIGH" -> Seq("Bug", "Regression"),
    "3-MEDIUM" -> Seq("Bug", "Groupby"),
    "4-NOT SPECIFIED" -> Seq("Docs"),
    "5-LOW" -> Seq("component: io", "Enhancement"))

  private def labelsCol: Column =
    labelsByPriority.foldLeft(lit(null).cast("array<string>")) {
      case (acc, (pr, labs)) =>
        when(col("o_orderpriority") === pr, typedLit(labs)).otherwise(acc)
    }

  /** orders → issue-shaped silver frame (same contract as
    * [[Silver.transform]]'s output columns that gold consumes).
    */
  def issuesSilver(orders: DataFrame): DataFrame = {
    val hrs = floor(col("o_totalprice")).cast("long") % 500
    val isClosed = col("o_orderstatus") === "F"
    orders
      .select(
        col("o_orderkey").as("issue_id"),
        col("o_orderdate").as("created_at"),
        when(isClosed, expr(
          "timestampadd(HOUR, CAST(CAST(floor(o_totalprice) AS BIGINT) % 500 AS INT), o_orderdate)"))
          .as("closed_at"),
        when(isClosed, hrs.cast("double")).as("resolution_hours"),
        labelsCol.as("labels_arr"))
      .withColumn("ticket_kind", Silver.ticketKind(col("labels_arr")))
      .withColumn("priority_tier",
        Silver.priorityTier(col("labels_arr"), col("ticket_kind")))
      .withColumn("component", Silver.component(col("labels_arr")))
  }

  /** The matching DuckDB derivation as a CTE body named `silver`. */
  val oracleSilverCte: String =
    """WITH silver AS (
      |  SELECT o_orderkey AS issue_id,
      |         o_orderdate AS created_at,
      |         CASE WHEN o_orderstatus = 'F'
      |              THEN o_orderdate + INTERVAL 1 HOUR * (CAST(floor(o_totalprice) AS BIGINT) % 500) END AS closed_at,
      |         CASE WHEN o_orderstatus = 'F'
      |              THEN CAST(CAST(floor(o_totalprice) AS BIGINT) % 500 AS DOUBLE) END AS resolution_hours,
      |         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM') THEN 'defect'
      |              WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 'docs'
      |              ELSE 'enhancement' END AS ticket_kind,
      |         CASE WHEN o_orderpriority = '1-URGENT' THEN 'P0'
      |              WHEN o_orderpriority = '2-HIGH' THEN 'P1'
      |              WHEN o_orderpriority = '3-MEDIUM' THEN 'P2'
      |              ELSE 'NA' END AS priority_tier,
      |         CASE WHEN o_orderpriority = '3-MEDIUM' THEN 'Groupby'
      |              WHEN o_orderpriority = '5-LOW' THEN 'io'
      |              ELSE 'other' END AS component
      |  FROM orders
      |)""".stripMargin
}
