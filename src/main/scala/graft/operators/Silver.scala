package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import graft.rules.IssueRules

/** Bronze → Silver transform: typed projection + rule-based enrichment.
  *
  * Re-expresses the reference's per-row Python rule engine (reference
  * `silver.py:41-98,143-180`) as pure Catalyst Column expressions — the rule
  * lists fold to array literals, every branch stays inside whole-stage
  * codegen, and zero UDFs are registered. First-match-wins over *array order*
  * is preserved with `filter(...)` + first-element, never a join.
  */
object Silver {

  /** Explicit bronze schema (schema-on-read made deterministic).
    *
    * Fields the pipeline consumes (reference `silver.py:148-171`,
    * `ingest.py:112-119`); everything nullable, mirroring the tolerant
    * `issue.get(...)` projection. `pull_request` presence marks a PR row
    * (excluded at ingest, reference `ingest.py:112`).
    */
  val bronzeSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("number", LongType),
    StructField("state", StringType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("closed_at", StringType),
    StructField("labels", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("pull_request", StructType(Seq(
      StructField("url", StringType))))
  ))

  /** `[x["name"] for x in issue.get("labels", []) if x.get("name")]`
    * (reference `silver.py:150`): project names, drop nulls/empties, missing
    * array → empty.
    */
  def labelNames(labels: Column): Column = {
    val names = F.filter(F.transform(labels, l => l.getField("name")),
      n => n.isNotNull && n =!= lit(""))
    coalesce(names, typedLit(Seq.empty[String]))
  }

  private def overlap(labels: Column, list: Seq[String]): Column =
    if (list.isEmpty) lit(false) else arrays_overlap(labels, typedLit(list))

  /** F1 — ticket kind, first match wins in order bug → docs → enhancement →
    * question (note: docs *before* enhancement, reference `silver.py:44-47`);
    * the bug kind maps to the string "defect" (reference `silver.py:43`).
    */
  def ticketKind(labels: Column, rules: IssueRules = IssueRules.reference): Column =
    when(overlap(labels, rules.kindBug), "defect")
      .when(overlap(labels, rules.kindDocs), "docs")
      .when(overlap(labels, rules.kindEnhancement), "enhancement")
      .when(overlap(labels, rules.kindQuestion), "question")
      .otherwise("other")

  /** F2 — priority tier (reference `silver.py:53-74`). Explicit P0/P1 are
    * honored even for non-defects; the P2 fallback requires kind == defect,
    * the config flag, and a bug label.
    */
  def priorityTier(labels: Column, kind: Column,
                   rules: IssueRules = IssueRules.reference): Column = {
    val p2 = kind === lit("defect") && lit(rules.p2FallbackIfBug) &&
      overlap(labels, rules.kindBug)
    when(overlap(labels, rules.p0Labels), "P0")
      .when(overlap(labels, rules.p1Labels), "P1")
      .when(p2, "P2")
      .otherwise("NA")
  }

  /** F3 — component pick (reference `silver.py:77-98`), three ordered rules
    * over *array order*:
    *   1. first label whose lowercased/trimmed form starts with a configured
    *      prefix → text after the FIRST colon of the *original* label,
    *      trimmed; "other" if the label has no colon;
    *   2. else first label in the allowlist;
    *   3. else first label not in metaLabels;
    *   4. else "other".
    */
  def component(labels: Column, rules: IssueRules = IssueRules.reference): Column = {
    val prefixes = rules.componentPrefixes.map(p => p.toLowerCase.trim)
    def hasPrefix(l: Column): Column =
      prefixes.map(p => lower(trim(l)).startsWith(lit(p)))
        .reduceOption(_ || _).getOrElse(lit(false))

    val prefLab = try_element_at(filter(labels, hasPrefix _), lit(1))
    // lab.split(":", 1)[1].strip() — substring after the FIRST colon
    val afterColon = trim(prefLab.substr(instr(prefLab, ":") + lit(1),
      lit(Int.MaxValue)))
    val byPrefix = when(prefLab.isNotNull,
      when(instr(prefLab, ":") > 0, afterColon).otherwise("other"))

    val byAllow = try_element_at(
      filter(labels, l => array_contains(typedLit(rules.componentAllowlist), l)), lit(1))

    val byFallback = try_element_at(
      filter(labels, l => !array_contains(typedLit(rules.metaLabels), l)), lit(1))

    coalesce(byPrefix, byAllow, byFallback, lit("other"))
  }

  /** ISO-8601 string → UTC timestamp, null on malformed input (pandas
    * `errors="coerce"`, reference `silver.py:175-176`). `try_to_timestamp`
    * keeps null-on-error semantics even under ANSI mode.
    */
  def coerceTimestamp(c: Column): Column = try_to_timestamp(c)

  /** Full silver transform: bronze rows (parsed with [[bronzeSchema]]) →
    * `issues_silver` (reference `silver.py:143-180`). Pure
    * `DataFrame => DataFrame`, no I/O.
    */
  def transform(bronze: DataFrame,
                rules: IssueRules = IssueRules.reference): DataFrame = {
    val arr = labelNames(col("labels"))
    val kind = ticketKind(arr, rules)
    val withCols = bronze
      .withColumn("labels_arr", arr)
      .withColumn("ticket_kind", kind)
      .withColumn("priority_tier", priorityTier(col("labels_arr"), col("ticket_kind"), rules))
      .withColumn("component", component(col("labels_arr"), rules))
      .withColumn("created_ts", coerceTimestamp(col("created_at")))
      .withColumn("updated_ts", coerceTimestamp(col("updated_at")))
      .withColumn("closed_ts", coerceTimestamp(col("closed_at")))
    withCols.select(
      col("id").as("issue_id"),
      col("number").as("issue_number"),
      col("state"),
      col("title"),
      col("body"),
      col("created_ts").as("created_at"),
      col("updated_ts").as("updated_at"),
      col("closed_ts").as("closed_at"),
      array_join(col("labels_arr"), "|").as("labels"),
      col("ticket_kind"),
      col("priority_tier"),
      col("component"),
      // total_seconds()/3600, null when either endpoint is null (the
      // reference additionally nulls rows with null closed_at — subsumed)
      ((col("closed_ts").cast("double") - col("created_ts").cast("double")) / 3600.0)
        .as("resolution_hours")
    )
  }

  /** Drop pull-request rows (presence of `pull_request`, reference
    * `ingest.py:112`).
    */
  def excludePullRequests(bronze: DataFrame): DataFrame =
    bronze.filter(col("pull_request").isNull)

  /** Ingest-time created_at floor (reference `ingest.py:116-119`). */
  def createdFrom(bronze: DataFrame, utcMidnight: String): DataFrame =
    bronze.filter(coerceTimestamp(col("created_at")) >= to_timestamp(lit(utcMidnight)))

  /** A1 + J1 — label catalog: frequency count over all labels, enriched with
    * descriptions via a broadcast left join, missing → "" (reference
    * `silver.py:150-152,193-196`).
    */
  def labelCatalog(bronze: DataFrame, descriptions: DataFrame): DataFrame =
    bronze
      .select(explode(labelNames(col("labels"))).as("label"))
      .groupBy("label").agg(count(lit(1)).as("count"))
      .join(broadcast(descriptions), Seq("label"), "left")
      .na.fill("", Seq("description"))
      .orderBy(desc("count"), col("label"))
}
