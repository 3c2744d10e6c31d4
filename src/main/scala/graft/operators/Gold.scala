package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.rules.IssueRules

/** Silver → Gold: monthly KPI marts (reference `gold.py:21-166`).
  *
  * Two outputs from one input:
  *   - `kpi_monthly_component_tier`, keyed `(month, component,
  *     priority_tier)`: created/closed flow, exact mean/median/p90 resolution
  *     hours, share-closed-within-bucket, per-group cumulative backlog;
  *   - `kpi_monthly_global`, keyed `month`: summed counts + closed-weighted
  *     re-aggregation of the per-group metrics.
  *
  * Scale notes (100 TB): both flows aggregate *before* any window — the
  * month×component×tier grain collapses cardinality by orders of magnitude,
  * so the running-total window (W1) runs over a tiny pre-aggregated frame.
  * The created/closed aggregates hash-partition on the same 3-column key, so
  * Catalyst reuses the exchange for their outer join. The four bucket shares
  * are folded into the same aggregate as the percentiles (conditional
  * aggregation), eliminating the reference's four extra joins (reference
  * `gold.py:98-107`). Exact interpolated percentiles are required for oracle
  * parity (pandas `median`/`quantile` ≡ DuckDB `quantile_cont` ≡ Spark
  * `percentile`); swap `percentile_approx` in when an application tolerates
  * approximation — that one change makes the aggregate fully mergeable.
  */
object Gold {

  final case class Marts(componentTier: DataFrame, global: DataFrame)

  private val keys = Seq("month", "component", "priority_tier")

  private def monthOf(ts: Column): Column = date_format(ts, "yyyy-MM")

  private def shareCol(b: Int): String = s"share_closed_within_${b}h"

  /** Defect-only focus (reference `gold.py:54`). */
  def defectsOnly(silver: DataFrame): DataFrame =
    silver.filter(col("ticket_kind") === "defect")

  /** A2 — created flow at (month, component, tier) grain
    * (reference `gold.py:61-69`); month from `created_at`.
    */
  def createdKpi(defects: DataFrame): DataFrame =
    defects
      .filter(col("created_at").isNotNull)
      .withColumn("month", monthOf(col("created_at")))
      .groupBy(keys.head, keys.tail: _*)
      .agg(count(col("issue_id")).as("created_count"))

  /** A3-A6 — closed flow + resolution stats + bucket shares in ONE aggregate
    * (reference `gold.py:72-107`); month from `closed_at`. Null
    * `resolution_hours` counts as not-within-bucket (pandas `NaN <= b` is
    * False) and is skipped by avg/percentile — both matched here.
    */
  def closedKpi(defects: DataFrame,
                buckets: Seq[Int] = IssueRules.reference.timeBucketsHours): DataFrame = {
    val res = col("resolution_hours").cast("double")
    val aggs: Seq[Column] =
      Seq(
        count(col("issue_id")).as("closed_count"),
        avg(res).as("avg_resolution_hours"),
        percentile(res, lit(0.5)).as("median_resolution_hours"),
        percentile(res, lit(0.9)).as("p90_resolution_hours")
      ) ++ buckets.map(b =>
        avg(when(res <= lit(b.toDouble), 1.0).otherwise(0.0)).as(shareCol(b)))
    defects
      .filter(col("closed_at").isNotNull && col("created_at").isNotNull)
      .withColumn("month", monthOf(col("closed_at")))
      .groupBy(keys.head, keys.tail: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** J3 + A7 + W1 — outer-merge created/closed, zero-fill counts, per-group
    * cumulative backlog (reference `gold.py:110-123`). Join keys are non-null
    * by construction (component/tier default to "other"/"NA", month from a
    * non-null timestamp), so a plain outer join is faithful to pandas'
    * `dropna=False` groupby-merge.
    */
  def componentTierMart(createdKpi: DataFrame, closedKpi: DataFrame): DataFrame = {
    val merged = createdKpi
      .join(closedKpi, keys, "outer")
      .withColumn("created_count", coalesce(col("created_count"), lit(0L)))
      .withColumn("closed_count", coalesce(col("closed_count"), lit(0L)))
    val w = Window
      .partitionBy("component", "priority_tier")
      .orderBy("month") // "yyyy-MM" strings sort chronologically
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("backlog_end",
        (sum(col("created_count")).over(w) - sum(col("closed_count")).over(w))
          .cast("long"))
      .orderBy("component", "priority_tier", "month")
  }

  /** A8 + A9 + J4 — global monthly rollup (reference `gold.py:126-151`):
    * counts summed from the component mart (backlog = sum of per-group
    * running totals, NOT a global cumsum), resolution metrics re-aggregated
    * from `closedKpi` as closed-count-weighted means of per-group means.
    * Zero total weight → null (reference `gold.py:140`), guarded explicitly
    * so the semantics hold under ANSI mode too.
    */
  def globalMart(componentTier: DataFrame, closedKpi: DataFrame,
                 buckets: Seq[Int] = IssueRules.reference.timeBucketsHours): DataFrame = {
    val counts = componentTier
      .groupBy("month")
      .agg(
        sum(col("created_count")).as("created_count"),
        sum(col("closed_count")).as("closed_count"),
        sum(col("backlog_end")).as("backlog_end"))
    val metricCols = Seq("avg_resolution_hours", "median_resolution_hours",
      "p90_resolution_hours") ++ buckets.map(shareCol)
    val wgt = col("closed_count").cast("double")
    val weighted: Seq[Column] = metricCols.map { m =>
      (sum(col(m) * wgt) / when(sum(wgt) =!= 0.0, sum(wgt))).as(m)
    }
    counts
      .join(closedKpi.groupBy("month").agg(weighted.head, weighted.tail: _*),
        Seq("month"), "left")
      .orderBy("month")
  }

  /** Fused single-pass component mart: instead of aggregating the created
    * and closed flows separately and outer-joining (reference topology,
    * [[createdKpi]]/[[closedKpi]]/[[componentTierMart]]), each defect row
    * contributes up to two tagged fact rows (one per flow) to a UNION, and
    * ONE hash aggregate computes both counts and all closed-side metrics
    * with conditional aggregation. Provably identical output, but: one pass
    * over silver instead of two, one shuffle instead of two-plus-join. At
    * 100 TB this halves the scan and removes the join exchange entirely.
    */
  def componentTierMartFused(defects: DataFrame,
                             buckets: Seq[Int] = IssueRules.reference.timeBucketsHours): DataFrame = {
    val res = col("resolution_hours").cast("double")
    val created = defects
      .filter(col("created_at").isNotNull)
      .select(monthOf(col("created_at")).as("month"),
        col("component"), col("priority_tier"),
        lit(1L).as("is_created"), lit(0L).as("is_closed"),
        lit(null).cast("double").as("res"))
    val closed = defects
      .filter(col("closed_at").isNotNull && col("created_at").isNotNull)
      .select(monthOf(col("closed_at")).as("month"),
        col("component"), col("priority_tier"),
        lit(0L).as("is_created"), lit(1L).as("is_closed"),
        res.as("res"))
    // created-flow rows carry null `res`, so avg/percentile see closed rows
    // only; bucket shares guard on is_closed so the null-res→0 default never
    // counts a created row
    val aggs: Seq[Column] =
      Seq(
        sum(col("is_created")).as("created_count"),
        sum(col("is_closed")).as("closed_count"),
        avg(col("res")).as("avg_resolution_hours"),
        percentile(col("res"), lit(0.5)).as("median_resolution_hours"),
        percentile(col("res"), lit(0.9)).as("p90_resolution_hours")
      ) ++ buckets.map(b =>
        avg(when(col("is_closed") === 1L,
          when(col("res") <= lit(b.toDouble), 1.0).otherwise(0.0)))
          .as(shareCol(b)))
    val merged = created.unionByName(closed)
      .groupBy(keys.head, keys.tail: _*)
      .agg(aggs.head, aggs.tail: _*)
    val w = Window
      .partitionBy("component", "priority_tier")
      .orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("backlog_end",
        (sum(col("created_count")).over(w) - sum(col("closed_count")).over(w))
          .cast("long"))
      .orderBy("component", "priority_tier", "month")
  }

  /** Global mart from the component mart alone: created-only rows have
    * closed_count = 0 and null metrics, so they contribute nothing to either
    * side of the weighted division — identical to re-aggregating closedKpi.
    */
  def globalMartFromMart(componentTier: DataFrame,
                         buckets: Seq[Int] = IssueRules.reference.timeBucketsHours): DataFrame = {
    val metricCols = Seq("avg_resolution_hours", "median_resolution_hours",
      "p90_resolution_hours") ++ buckets.map(shareCol)
    val wgt = col("closed_count").cast("double")
    // pandas parity (reference gold.py:137-140): numerator skips null
    // metrics, denominator is Σw over ALL rows — created-only mart rows
    // carry w = 0 so they never shift either side
    val weighted: Seq[Column] = metricCols.map { m =>
      (sum(col(m) * wgt) / when(sum(wgt) =!= 0.0, sum(wgt))).as(m)
    }
    val aggs: Seq[Column] = Seq(
      sum(col("created_count")).as("created_count"),
      sum(col("closed_count")).as("closed_count"),
      sum(col("backlog_end")).as("backlog_end")) ++ weighted
    componentTier
      .groupBy("month")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("month")
  }

  /** End-to-end: silver → both marts (fused single-pass plan). */
  def buildMarts(silver: DataFrame,
                 rules: IssueRules = IssueRules.reference): Marts = {
    val defects = defectsOnly(silver)
    val mart = componentTierMartFused(defects, rules.timeBucketsHours)
    Marts(mart, globalMartFromMart(mart, rules.timeBucketsHours))
  }

  /** Scale-mode mart: same plan as [[componentTierMartFused]] but with
    * `percentile_approx` (relative-accuracy sketch, fully mergeable
    * aggregate — restores map-side partials that exact percentiles forgo).
    * Use at production scale where a bounded-error median/p90 is
    * acceptable; the exact form stays the oracle-parity default.
    */
  def componentTierMartApprox(defects: DataFrame,
                              buckets: Seq[Int] = IssueRules.reference.timeBucketsHours,
                              accuracy: Int = 10000): DataFrame = {
    val res = col("resolution_hours").cast("double")
    val created = defects
      .filter(col("created_at").isNotNull)
      .select(monthOf(col("created_at")).as("month"),
        col("component"), col("priority_tier"),
        lit(1L).as("is_created"), lit(0L).as("is_closed"),
        lit(null).cast("double").as("res"))
    val closed = defects
      .filter(col("closed_at").isNotNull && col("created_at").isNotNull)
      .select(monthOf(col("closed_at")).as("month"),
        col("component"), col("priority_tier"),
        lit(0L).as("is_created"), lit(1L).as("is_closed"), res.as("res"))
    val aggs: Seq[Column] =
      Seq(
        sum(col("is_created")).as("created_count"),
        sum(col("is_closed")).as("closed_count"),
        avg(col("res")).as("avg_resolution_hours"),
        percentile_approx(col("res"), lit(0.5), lit(accuracy))
          .as("median_resolution_hours"),
        percentile_approx(col("res"), lit(0.9), lit(accuracy))
          .as("p90_resolution_hours")
      ) ++ buckets.map(b =>
        avg(when(col("is_closed") === 1L,
          when(col("res") <= lit(b.toDouble), 1.0).otherwise(0.0)))
          .as(shareCol(b)))
    val merged = created.unionByName(closed)
      .groupBy(keys.head, keys.tail: _*)
      .agg(aggs.head, aggs.tail: _*)
    val w = Window
      .partitionBy("component", "priority_tier")
      .orderBy("month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("backlog_end",
        (sum(col("created_count")).over(w) - sum(col("closed_count")).over(w))
          .cast("long"))
      .orderBy("component", "priority_tier", "month")
  }

  /** Incremental mart maintenance — the scale path the reference lacks
    * (it recomputes everything from the newest full snapshot,
    * `silver.py:12-17`). Given the previous component mart and the FULL
    * current silver (after a MERGE of new/updated issues), recompute only
    * the (component, priority_tier) groups touched by `changedSilver` and
    * splice them into the previous mart.
    *
    * Correctness note: backlog is a running total, so a change in month m
    * invalidates every later month of that group — hence whole-GROUP
    * recompute, not whole-month. Groups are the right unit: cardinality is
    * tiny (components × tiers) while rows-per-group is what grows with
    * data, and untouched groups — the vast majority under incremental
    * ingest — are never rescanned. Equivalence with a full rebuild is
    * pinned by IncrementalGoldSpec.
    */
  def incrementalMartUpdate(prevMart: DataFrame, silver: DataFrame,
                            changedSilver: DataFrame,
                            rules: IssueRules = IssueRules.reference): DataFrame = {
    val touched = defectsOnly(changedSilver)
      .select("component", "priority_tier").distinct()
    val touchedDefects = defectsOnly(silver)
      .join(broadcast(touched), Seq("component", "priority_tier"), "left_semi")
    val rebuilt = componentTierMartFused(touchedDefects, rules.timeBucketsHours)
    prevMart
      .join(broadcast(touched), Seq("component", "priority_tier"), "left_anti")
      .unionByName(rebuilt)
      .orderBy("component", "priority_tier", "month")
  }

  /** Reference-topology build (two aggregates + outer join), kept as the
    * semantics documentation and used by equivalence tests against the
    * fused plan.
    */
  def buildMartsStaged(silver: DataFrame,
                       rules: IssueRules = IssueRules.reference): Marts = {
    val defects = defectsOnly(silver)
    val created = createdKpi(defects)
    val closed = closedKpi(defects, rules.timeBucketsHours)
    val mart = componentTierMart(created, closed)
    Marts(mart, globalMart(mart, closed, rules.timeBucketsHours))
  }
}
