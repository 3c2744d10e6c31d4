package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.operators.Gold

/** Hand-computed golden for the KPI marts (reference `gold.py` semantics):
  * gap months, open issues, exact interpolated p90, two-stage weighted
  * global rollup, backlog-as-sum-of-group-cumsums.
  */
class GoldSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (issue_id, kind, component, tier, created_at, closed_at, resolution_hours)
  private lazy val silver = Seq(
    (1L, "defect", "X", "P2", ts("2024-01-05 00:00:00"), ts("2024-01-05 10:00:00"), Some(10.0)),
    (2L, "defect", "X", "P2", ts("2024-01-10 00:00:00"), ts("2024-02-05 00:00:00"), Some(50.0)),
    (3L, "defect", "X", "P2", ts("2024-01-15 00:00:00"), ts("2024-02-20 00:00:00"), Some(100.0)),
    (4L, "defect", "X", "P2", ts("2024-03-02 00:00:00"), null.asInstanceOf[Timestamp], None),
    (5L, "defect", "Y", "P0", ts("2024-01-20 00:00:00"), ts("2024-02-10 00:00:00"), Some(30.0)),
    (6L, "docs",   "Z", "NA", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"), Some(24.0))
  ).toDF("issue_id", "ticket_kind", "component", "priority_tier",
    "created_at", "closed_at", "resolution_hours")

  private lazy val marts = Gold.buildMarts(silver)

  private def key(r: Row) = (r.getAs[String]("month"),
    r.getAs[String]("component"), r.getAs[String]("priority_tier"))

  private lazy val mart: Map[(String, String, String), Row] =
    marts.componentTier.collect().map(r => key(r) -> r).toMap
  private lazy val global: Map[String, Row] =
    marts.global.collect().map(r => r.getAs[String]("month") -> r).toMap

  private def d(r: Row, c: String): Double = r.getAs[Double](c)
  private def isNull(r: Row, c: String): Boolean = r.isNullAt(r.fieldIndex(c))

  test("component mart: counts, exact percentiles, bucket shares") {
    assert(mart.size == 5) // docs row filtered out; gap month absent
    val janX = mart(("2024-01", "X", "P2"))
    assert(janX.getAs[Long]("created_count") == 3L)
    assert(janX.getAs[Long]("closed_count") == 1L)
    assert(d(janX, "avg_resolution_hours") == 10.0)
    assert(d(janX, "share_closed_within_24h") == 1.0)

    val febX = mart(("2024-02", "X", "P2"))
    assert(febX.getAs[Long]("created_count") == 0L) // zero-filled after outer join
    assert(febX.getAs[Long]("closed_count") == 2L)
    assert(d(febX, "avg_resolution_hours") == 75.0)
    assert(d(febX, "median_resolution_hours") == 75.0)
    assert(math.abs(d(febX, "p90_resolution_hours") - 95.0) < 1e-9) // linear interp
    assert(d(febX, "share_closed_within_24h") == 0.0)
    assert(d(febX, "share_closed_within_72h") == 0.5)
    assert(d(febX, "share_closed_within_168h") == 1.0)

    val marX = mart(("2024-03", "X", "P2"))
    assert(marX.getAs[Long]("created_count") == 1L)
    assert(isNull(marX, "avg_resolution_hours"))
  }

  test("backlog_end: per-group running totals") {
    assert(mart(("2024-01", "X", "P2")).getAs[Long]("backlog_end") == 2L)
    assert(mart(("2024-02", "X", "P2")).getAs[Long]("backlog_end") == 0L)
    assert(mart(("2024-03", "X", "P2")).getAs[Long]("backlog_end") == 1L)
    assert(mart(("2024-01", "Y", "P0")).getAs[Long]("backlog_end") == 1L)
    assert(mart(("2024-02", "Y", "P0")).getAs[Long]("backlog_end") == 0L)
  }

  test("fused single-pass plan ≡ reference-topology staged plan") {
    val staged = Gold.buildMartsStaged(silver)
    val fused = marts
    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean = {
      val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq
      a.select(cols: _*).exceptAll(b.select(cols: _*)).isEmpty &&
        b.select(cols: _*).exceptAll(a.select(cols: _*)).isEmpty
    }
    assert(same(staged.componentTier, fused.componentTier))
    assert(same(staged.global, fused.global))
  }

  test("global mart: summed counts, sum-of-group backlogs, weighted metrics") {
    val jan = global("2024-01")
    assert(jan.getAs[Long]("created_count") == 4L)
    assert(jan.getAs[Long]("closed_count") == 1L)
    assert(jan.getAs[Long]("backlog_end") == 3L)
    assert(d(jan, "avg_resolution_hours") == 10.0)

    val feb = global("2024-02")
    assert(feb.getAs[Long]("created_count") == 0L)
    assert(feb.getAs[Long]("closed_count") == 3L)
    assert(feb.getAs[Long]("backlog_end") == 0L)
    // closed-weighted means of per-group means: (75*2 + 30*1)/3
    assert(math.abs(d(feb, "avg_resolution_hours") - 60.0) < 1e-9)
    assert(math.abs(d(feb, "p90_resolution_hours") - (95.0 * 2 + 30.0) / 3) < 1e-9)
    assert(math.abs(d(feb, "share_closed_within_72h") - (0.5 * 2 + 1.0) / 3) < 1e-9)
    assert(d(feb, "share_closed_within_24h") == 0.0)

    val mar = global("2024-03")
    assert(mar.getAs[Long]("created_count") == 1L)
    assert(mar.getAs[Long]("backlog_end") == 1L)
    assert(isNull(mar, "avg_resolution_hours")) // no closed rows that month
  }
}
