package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Silver
import graft.rules.IssueRules

/** Rule-engine branch coverage per FIXTURES.md §1 (semantics pinned against
  * reference `silver.py:41-98` + `config.yml`).
  */
class SilverSpec extends SparkSpec {
  import spark.implicits._

  private def j(fields: String*): String = "{" + fields.mkString(",") + "}"
  private def labels(names: String*): String =
    "\"labels\":[" + names.map(n => s"""{"name":"$n"}""").mkString(",") + "]"

  private val lines: Seq[String] = Seq(
    // 1: Bug+Blocker → defect/P0; all labels meta → component other
    j("\"id\":1,\"number\":1,\"state\":\"closed\"",
      "\"created_at\":\"2024-01-01T00:00:00Z\"",
      "\"closed_at\":\"2024-01-02T06:00:00Z\"", labels("Bug", "Blocker")),
    // 2: Bug+Regression+Groupby → defect/P1/Groupby (allowlist)
    j("\"id\":2,\"state\":\"open\"", labels("Bug", "Regression", "Groupby")),
    // 3: Bug only → defect/P2
    j("\"id\":3", labels("Bug")),
    // 4: Docs+Enhancement → docs wins (docs checked before enhancement)
    j("\"id\":4", labels("Docs", "Enhancement")),
    // 5: Enhancement → enhancement/NA
    j("\"id\":5", labels("Enhancement")),
    // 6: Usage Question → question/NA
    j("\"id\":6", labels("Usage Question")),
    // 7: Segfault without Bug → kind other but explicit P0
    j("\"id\":7", labels("Segfault")),
    // 8: prefix rule, trims after FIRST colon of original label
    j("\"id\":8", labels("component: IO CSV ")),
    // 9: multi-colon label keeps the remainder intact
    j("\"id\":9", labels("module: core: x")),
    // 10: empty labels array
    j("\"id\":10", labels()),
    // 11: labels field missing entirely
    j("\"id\":11"),
    // 12: malformed created_at → null ts; open → null resolution
    j("\"id\":12,\"created_at\":\"not-a-date\"", labels("Bug")),
    // 13: mixed-case prefix matches case-insensitively, original case kept
    j("\"id\":13", labels("Component: Window")),
    // 14: process label only → component falls through to other
    j("\"id\":14", labels("Needs Triage")),
    // 15: first non-meta label wins fallback (no allowlist hit present)
    j("\"id\":15", labels("Needs Triage", "weird-label", "another-odd")),
    // 20: allowlist rule runs before fallback even if a non-meta label
    //     appears earlier in the array
    j("\"id\":20", labels("weird-label", "Groupby")),
    // 16: priority P0 beats P1 regardless of array order
    j("\"id\":16", labels("Regression", "Blocker", "Bug")),
    // 17: allowlist first-in-array-order
    j("\"id\":17", labels("Datetime", "Groupby")),
    // 18: prefix rule anywhere in array beats allowlist earlier in array
    j("\"id\":18", labels("Groupby", "area: foo")),
    // 19: PR row — must be excluded by excludePullRequests
    j("\"id\":19,\"pull_request\":{\"url\":\"x\"}", labels("Bug"))
  )

  private lazy val bronze =
    spark.read.schema(Silver.bronzeSchema).json(lines.toDS)
  private lazy val silver = Silver.transform(Silver.excludePullRequests(bronze))

  private lazy val byId: Map[Long, Row] =
    silver.collect().map(r => r.getAs[Long]("issue_id") -> r).toMap

  private def kind(id: Long) = byId(id).getAs[String]("ticket_kind")
  private def tier(id: Long) = byId(id).getAs[String]("priority_tier")
  private def comp(id: Long) = byId(id).getAs[String]("component")

  test("PR rows excluded") { assert(!byId.contains(19L)) }

  test("ticket kind first-match order, docs before enhancement") {
    assert(kind(1) == "defect"); assert(kind(4) == "docs")
    assert(kind(5) == "enhancement"); assert(kind(6) == "question")
    assert(kind(7) == "other"); assert(kind(10) == "other")
    assert(kind(11) == "other")
  }

  test("priority tiers incl. explicit P0 without Bug and P2 fallback") {
    assert(tier(1) == "P0"); assert(tier(2) == "P1"); assert(tier(3) == "P2")
    assert(tier(7) == "P0") // Segfault, kind=other
    assert(tier(16) == "P0") // P0 checked before P1
    assert(tier(5) == "NA"); assert(tier(10) == "NA")
  }

  test("component: prefix rule, first-colon split, original case") {
    assert(comp(8) == "IO CSV")
    assert(comp(9) == "core: x")
    assert(comp(13) == "Window")
    assert(comp(18) == "foo") // prefix rule scans before allowlist
  }

  test("component: allowlist order and meta fallback") {
    assert(comp(2) == "Groupby")
    assert(comp(17) == "Datetime")
    assert(comp(15) == "weird-label")
    assert(comp(20) == "Groupby")
    assert(comp(14) == "other"); assert(comp(1) == "other")
    assert(comp(10) == "other"); assert(comp(11) == "other")
  }

  test("prefix label without colon → other (custom rules)") {
    val rules = IssueRules.reference.copy(componentPrefixes = Seq("mod"))
    val df = spark.read.schema(Silver.bronzeSchema)
      .json(Seq(j("\"id\":1", labels("module x"))).toDS)
    val out = Silver.transform(df, rules).collect().head
    assert(out.getAs[String]("component") == "other")
  }

  test("timestamps coerce, resolution_hours derived / null when open") {
    val r1 = byId(1L)
    assert(r1.getAs[java.sql.Timestamp]("created_at") != null)
    assert(math.abs(r1.getAs[Double]("resolution_hours") - 30.0) < 1e-9)
    assert(byId(12L).getAs[java.sql.Timestamp]("created_at") == null)
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("resolution_hours")))
  }

  test("labels pipe-joined") {
    assert(byId(2L).getAs[String]("labels") == "Bug|Regression|Groupby")
    assert(byId(10L).getAs[String]("labels") == "")
  }

  test("label catalog counts desc with broadcast description join") {
    val desc = Seq(("Bug", "a bug")).toDF("label", "description")
    val cat = Silver.labelCatalog(Silver.excludePullRequests(bronze), desc).collect()
    val bug = cat.find(_.getAs[String]("label") == "Bug").get
    assert(bug.getAs[Long]("count") == 5L)
    assert(bug.getAs[String]("description") == "a bug")
    val grp = cat.find(_.getAs[String]("label") == "Groupby").get
    assert(grp.getAs[String]("description") == "")
    // sorted desc by count
    val counts = cat.map(_.getAs[Long]("count")).toSeq
    assert(counts == counts.sorted.reverse)
  }
}
