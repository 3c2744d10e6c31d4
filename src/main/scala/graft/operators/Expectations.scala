package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a frame — the query-level
  * twin of [[graft.sources.VersionedTable]]'s storage-level CHECK
  * constraints: named predicates audited and enforced BEFORE data lands,
  * with the failing rows quarantined for inspection instead of silently
  * dropped (the expectations/quarantine pattern production pipelines run
  * between bronze and silver).
  *
  * Null semantics are the OPPOSITE of SQL CHECK, deliberately: an
  * expectation passes only when its predicate is TRUE — unknown is a
  * failure. A CHECK constraint guards writers against provably-bad rows
  * (null passes); an expectation certifies data quality, and "couldn't
  * evaluate" certifies nothing.
  *
  * Scale shape: [[audit]] is ONE aggregate scan regardless of rule count
  * (each rule a conditional sum, map-side combined — never a pass per
  * rule); [[split]] is one scan with the same predicates fused into a
  * row-level conjunction, and the failed-rule names ride along as an
  * array column so the quarantine is self-describing. Both are pure
  * plans — composable, pushdown-friendly, nothing driver-side.
  */
object Expectations {

  final case class Rule(name: String, predicate: Column)

  private def passes(r: Rule): Column = r.predicate.isNotNull && r.predicate

  /** One row per rule: rows audited, passes, failures (nulls count as
    * failures — see class doc). Single aggregate scan for all rules, and a
    * pure PLAN end to end — the one-row aggregate pivots to rule-per-row
    * with a literal-array explode, no driver action, so the audit composes
    * under streaming foreachBatch and lazy pipelines alike.
    */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit requires at least one rule")
    val aggs = rules.map { r =>
      sum(when(passes(r), 1L).otherwise(0L)).as(s"__p_${r.name}")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(rules.map { r =>
        struct(lit(r.name).as("rule"),
          col("__n").as("n_rows"),
          col(s"__p_${r.name}").as("n_pass"),
          (col("__n") - col(s"__p_${r.name}")).as("n_fail"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_pass"), col("r.n_fail"))
  }

  /** (clean, quarantine): rows passing EVERY rule, and the rest tagged
    * with the sorted array of the rule names they failed.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "split requires at least one rule")
    val allPass = rules.map(passes).reduce(_ && _)
    val failed = array_sort(filter(
      array(rules.map(r => when(!passes(r), lit(r.name))): _*),
      c => c.isNotNull))
    val clean = df.filter(allPass)
    val quarantine = df.filter(!allPass)
      .withColumn("failed_rules", failed)
    (clean, quarantine)
  }
}
