package graft

import graft.operators.Silver
import graft.rules.IssueRules

/** Runtime rules config: the reference's operator workflow is "edit
  * `config.yml`, re-run" (reference `config.yml:7-68`) — the JSON loader
  * must reproduce that without a recompile: overridden lists change
  * classification, omitted keys keep the shipped defaults, typo'd keys
  * reject instead of silently reverting.
  */
class RulesConfigSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  private def kinds(rules: IssueRules): Map[Long, String] = {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("Defect")),
      (2L, Seq("Bug")),
      (3L, Seq("Docs"))
    ).toDF("id", "labels_arr")
    df.select(col("id"), Silver.ticketKind(col("labels_arr"), rules).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("an overridden kind list changes classification at runtime") {
    val loaded = IssueRules.fromJson("""{"kind_bug": ["Defect"]}""")
    val before = kinds(IssueRules.reference)
    val after = kinds(loaded)
    assert(before(1L) === "other" && before(2L) === "defect")
    assert(after(1L) === "defect" && after(2L) === "other")
    assert(after(3L) === "docs") // untouched keys keep reference behavior
  }

  test("omitted keys fall back to the shipped reference config") {
    val loaded = IssueRules.fromJson("""{"p0_labels": ["Showstopper"]}""")
    assert(loaded.p0Labels === Seq("Showstopper"))
    assert(loaded.kindBug === IssueRules.reference.kindBug)
    assert(loaded.componentAllowlist === IssueRules.reference.componentAllowlist)
    assert(loaded.timeBucketsHours === IssueRules.reference.timeBucketsHours)
    // derived meta-label set rebuilds from the overridden parts
    assert(loaded.metaLabels.contains("Showstopper"))
    assert(!loaded.metaLabels.contains("Blocker"))
  }

  test("unknown keys reject loudly instead of silently defaulting") {
    val e = intercept[IllegalArgumentException] {
      IssueRules.fromJson("""{"kind_bugs": ["Bug"]}""")
    }
    assert(e.getMessage.contains("kind_bugs"))
  }

  test("a rules file drives the full silver transform") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempFile("rules", ".json")
    java.nio.file.Files.write(tmp,
      """{"p1_labels": ["Regression", "Perf Regression"]}""".getBytes)
    try {
      val rules = IssueRules.fromJsonFile(tmp.toString)
      val bronze = Seq(
        (10L, 1L, "open", "t", "b", "2024-01-01T00:00:00Z",
          "2024-01-02T00:00:00Z", null.asInstanceOf[String],
          Seq("Bug", "Perf Regression"))
      ).toDF("id", "number", "state", "title", "body",
        "created_at", "updated_at", "closed_at", "names")
        .withColumn("labels",
          transform(col("names"), n => struct(n.as("name")))).drop("names")
      val out = Silver.transform(bronze, rules)
        .select("issue_id", "priority_tier").collect()
      assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((10L, "P1"))) // P2 under reference rules, P1 under the file
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("the reference's verbatim config.yml loads and equals the shipped rules") {
    val path = java.nio.file.Paths.get("/root/reference/config.yml")
    assume(java.nio.file.Files.exists(path))
    val loaded = IssueRules.fromYamlFile(path.toString)
    assert(loaded === IssueRules.reference)
    assert(loaded.metaLabels === IssueRules.reference.metaLabels)
  }

  test("yaml overrides change classification; omissions keep defaults") {
    val loaded = IssueRules.fromYaml(
      """rules:
        |  kind_labels:
        |    bug: ["Defect"]   # comment survives stripping
        |  priority_tiers:
        |    P0: ["Showstopper"]
        |    P2_fallback_if_bug: false
        |  time_buckets_hours: [12, 48]
        |""".stripMargin)
    assert(loaded.kindBug === Seq("Defect"))
    assert(loaded.kindDocs === IssueRules.reference.kindDocs)
    assert(loaded.p0Labels === Seq("Showstopper"))
    assert(loaded.p1Labels === IssueRules.reference.p1Labels)
    assert(!loaded.p2FallbackIfBug)
    assert(loaded.timeBucketsHours === Seq(12, 48))
    assert(loaded.componentAllowlist === IssueRules.reference.componentAllowlist)
    val before = kinds(IssueRules.reference)
    val after = kinds(loaded)
    assert(before(1L) === "other" && after(1L) === "defect")
  }

  test("yaml unknown rule keys reject loudly") {
    val e = intercept[IllegalArgumentException] {
      IssueRules.fromYaml("rules:\n  kind_label:\n    bug: [\"Bug\"]\n")
    }
    assert(e.getMessage.contains("kind_label"))
  }

  test("a bare rules map (no rules: wrapper) also loads") {
    val loaded = IssueRules.fromYaml(
      """process_labels:
        |  - "Needs Triage"
        |  - "Waiting"
        |""".stripMargin)
    assert(loaded.processLabels === Seq("Needs Triage", "Waiting"))
  }
}
