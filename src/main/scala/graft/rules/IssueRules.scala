package graft.rules

/** Business-rule configuration for silver enrichment.
  *
  * Mirrors the rule surface of the reference's `config.yml` (reference
  * `config.yml:7-68`): kind labels, process labels, priority tiers, component
  * prefixes/allowlist, time buckets. Held as plain Scala data so the rule
  * compiler ([[graft.operators.Silver]]) can fold the lists into literal
  * Catalyst expressions — constant-folded, codegen'd, no UDFs.
  *
  * `metaLabels` reproduces the construction at reference `silver.py:116-120`:
  * process labels ∪ all kind labels ∪ P0 ∪ P1 — the labels that must never be
  * chosen as a component.
  */
final case class IssueRules(
    kindBug: Seq[String],
    kindDocs: Seq[String],
    kindEnhancement: Seq[String],
    kindQuestion: Seq[String],
    processLabels: Seq[String],
    p0Labels: Seq[String],
    p1Labels: Seq[String],
    p2FallbackIfBug: Boolean,
    componentPrefixes: Seq[String],
    componentAllowlist: Seq[String],
    timeBucketsHours: Seq[Int]
) {
  def metaLabels: Seq[String] =
    (processLabels ++ kindBug ++ kindDocs ++ kindEnhancement ++ kindQuestion ++
      p0Labels ++ p1Labels).distinct
}

object IssueRules {

  /** The reference's shipped configuration (reference `config.yml:9-68`). */
  val reference: IssueRules = IssueRules(
    kindBug = Seq("Bug"),
    kindDocs = Seq("Docs"),
    kindEnhancement = Seq("Enhancement"),
    kindQuestion = Seq("Usage Question"),
    processLabels = Seq(
      "Needs Triage", "Needs Discussion", "Needs Info", "Closing Candidate",
      "good first issue", "Needs Tests", "Duplicate Report", "Upstream issue"),
    p0Labels = Seq("Blocker", "Blocker for rc", "Segfault"),
    p1Labels = Seq("Regression"),
    p2FallbackIfBug = true,
    componentPrefixes = Seq("component:", "module:", "area:"),
    componentAllowlist = Seq(
      "Indexing", "Groupby", "Arrow", "Datetime", "Reshaping", "Missing-data",
      "Dtype Conversions", "Performance", "IO CSV", "Strings",
      "Error Reporting", "Deprecate", "MultiIndex", "Apply", "Build",
      "API Design", "Numeric Operations", "IO Excel", "ExtensionArray",
      "Visualization", "Categorical", "Index", "API - Consistency", "Window",
      "Reduction Operations", "IO SQL", "IO JSON", "NA - MaskedArrays",
      "IO Data", "Frequency"),
    timeBucketsHours = Seq(24, 72, 168, 336)
  )
}
