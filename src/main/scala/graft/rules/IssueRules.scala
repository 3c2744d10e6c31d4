package graft.rules

import scala.jdk.CollectionConverters._

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

  /** Load rules from a JSON file — the reference's one operator workflow
    * is "edit `config.yml`, re-run" (reference `config.yml:7-68`,
    * `silver.py:102-120`); this is that workflow without a recompile.
    * Every key is optional and falls back to [[reference]], so a config
    * that only overrides `p0_labels` stays three lines. Unknown keys
    * reject loudly — a typo'd key silently reverting to the default is
    * the worst failure mode a rules file can have.
    */
  def fromJsonFile(path: String): IssueRules =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def fromJson(json: String): IssueRules = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    val known = Set(
      "kind_bug", "kind_docs", "kind_enhancement", "kind_question",
      "process_labels", "p0_labels", "p1_labels", "p2_fallback_if_bug",
      "component_prefixes", "component_allowlist", "time_buckets_hours")
    val unknown = node.fieldNames().asScala.toSeq.filterNot(known)
    require(unknown.isEmpty,
      s"unknown rules keys: ${unknown.mkString(", ")} (known: ${known.toSeq.sorted.mkString(", ")})")
    def strs(key: String, dflt: Seq[String]): Seq[String] =
      Option(node.get(key)).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(dflt)
    def ints(key: String, dflt: Seq[Int]): Seq[Int] =
      Option(node.get(key)).map(_.elements().asScala.map(_.asInt()).toSeq)
        .getOrElse(dflt)
    val r = reference
    IssueRules(
      kindBug = strs("kind_bug", r.kindBug),
      kindDocs = strs("kind_docs", r.kindDocs),
      kindEnhancement = strs("kind_enhancement", r.kindEnhancement),
      kindQuestion = strs("kind_question", r.kindQuestion),
      processLabels = strs("process_labels", r.processLabels),
      p0Labels = strs("p0_labels", r.p0Labels),
      p1Labels = strs("p1_labels", r.p1Labels),
      p2FallbackIfBug = Option(node.get("p2_fallback_if_bug"))
        .map(_.asBoolean()).getOrElse(r.p2FallbackIfBug),
      componentPrefixes = strs("component_prefixes", r.componentPrefixes),
      componentAllowlist = strs("component_allowlist", r.componentAllowlist),
      timeBucketsHours = ints("time_buckets_hours", r.timeBucketsHours))
  }

  /** Load rules from the reference's OWN config format — nested YAML
    * (reference `config.yml:7-72`, loaded at `silver.py:104-120`): a user
    * holding the reference's actual `config.yml` feeds it in verbatim.
    * Accepts a top-level `rules:` section (the full file, `source:` and
    * `hours_in_month` accepted and ignored — ingest/source config lives in
    * the CLI, and monthly normalization is a gold-side display concern) or
    * a bare rules map. Every omitted key falls back to [[reference]];
    * unknown keys inside `rules` reject loudly, like [[fromJson]].
    */
  def fromYamlFile(path: String): IssueRules =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def fromYaml(yaml: String): IssueRules = {
    val root = YamlLite.parse(yaml)
    val rules: Map[String, Any] = root.get("rules") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _                  => root
    }
    val known = Set("kind_labels", "process_labels", "priority_tiers",
      "component", "time_buckets_hours", "hours_in_month")
    val unknown = rules.keySet.filterNot(known).filterNot(_ == "source")
    require(unknown.isEmpty,
      s"unknown rules keys: ${unknown.mkString(", ")} (known: ${known.toSeq.sorted.mkString(", ")})")
    def sub(key: String): Map[String, Any] = rules.get(key) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _                  => Map.empty
    }
    def strSeq(v: Any): Seq[String] = v match {
      case xs: Seq[_] => xs.map(_.toString)
      case other      => Seq(other.toString)
    }
    val kinds = sub("kind_labels")
    val tiers = sub("priority_tiers")
    val comp = sub("component")
    def kindOr(key: String, dflt: Seq[String]): Seq[String] =
      kinds.get(key).map(strSeq).getOrElse(dflt)
    val r = reference
    IssueRules(
      kindBug = kindOr("bug", r.kindBug),
      kindDocs = kindOr("docs", r.kindDocs),
      kindEnhancement = kindOr("enhancement", r.kindEnhancement),
      kindQuestion = kindOr("question", r.kindQuestion),
      processLabels = rules.get("process_labels").map(strSeq)
        .getOrElse(r.processLabels),
      p0Labels = tiers.get("P0").map(strSeq).getOrElse(r.p0Labels),
      p1Labels = tiers.get("P1").map(strSeq).getOrElse(r.p1Labels),
      p2FallbackIfBug = tiers.get("P2_fallback_if_bug") match {
        case Some(b: Boolean) => b
        case Some(other)      => other.toString.toBoolean
        case None             => r.p2FallbackIfBug
      },
      componentPrefixes = comp.get("prefixes").map(strSeq)
        .getOrElse(r.componentPrefixes),
      componentAllowlist = comp.get("allowlist").map(strSeq)
        .getOrElse(r.componentAllowlist),
      timeBucketsHours = rules.get("time_buckets_hours")
        .map(strSeq(_).map(_.toInt)).getOrElse(r.timeBucketsHours))
  }

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
