package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Gold

/** Property-based invariants (SURVEY.md §5.4) over randomly generated
  * silver frames:
  *   - backlog recurrence: backlog(m) = backlog(prev) + created − closed
  *     within each (component, tier) group;
  *   - bucket shares ∈ [0,1] and monotone in the bucket;
  *   - Σ created_count = #defect rows with created_at;
  *   - percentile ordering: median ≤ p90 ≤ max observable resolution.
  */
object GoldProperties extends Properties("Gold") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = GraftSession.builder("gold-props", cores = 4).getOrCreate()

  private val months = (1 to 6).map(m => f"2024-$m%02d-15 00:00:00")

  private case class Iss(id: Long, kind: String, comp: String, tier: String,
                         created: String, closedOffH: Option[Int])

  private val genIssue: Gen[Iss] = for {
    id <- Gen.choose(1L, 1000000L)
    kind <- Gen.frequency(4 -> Gen.const("defect"), 1 -> Gen.oneOf("docs", "other"))
    comp <- Gen.oneOf("X", "Y", "Z")
    tier <- Gen.oneOf("P0", "P2", "NA")
    created <- Gen.oneOf(months)
    closed <- Gen.option(Gen.choose(0, 2000))
  } yield Iss(id, kind, comp, tier, created, closed)

  private val genFrame: Gen[List[Iss]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, genIssue))

  private def toDf(issues: List[Iss]) = {
    val sp = spark
    import sp.implicits._
    issues.map { i =>
      val created = Timestamp.valueOf(i.created)
      val closed = i.closedOffH
        .map(h => new Timestamp(created.getTime + h * 3600L * 1000L))
        .orNull
      val res = i.closedOffH.map(_.toDouble)
      (i.id, i.kind, i.comp, i.tier, created, closed, res)
    }.toDF("issue_id", "ticket_kind", "component", "priority_tier",
      "created_at", "closed_at", "resolution_hours")
  }

  private def d(r: Row, c: String): Option[Double] = {
    val i = r.fieldIndex(c)
    if (r.isNullAt(i)) None else Some(r.getDouble(i))
  }

  property("mart invariants") = Prop.forAll(genFrame) { issues =>
    val silver = toDf(issues)
    val mart = Gold.buildMarts(silver).componentTier.collect()

    val byGroup = mart.groupBy(r =>
      (r.getAs[String]("component"), r.getAs[String]("priority_tier")))
    val recurrence = byGroup.values.forall { rows =>
      val sorted = rows.sortBy(_.getAs[String]("month"))
      sorted.zip(0L +: sorted.map(_.getAs[Long]("backlog_end")).init).forall {
        case (r, prev) =>
          r.getAs[Long]("backlog_end") ==
            prev + r.getAs[Long]("created_count") - r.getAs[Long]("closed_count")
      }
    }

    val shareCols = Seq(24, 72, 168, 336).map(b => s"share_closed_within_${b}h")
    val sharesOk = mart.forall { r =>
      val shares = shareCols.flatMap(c => d(r, c))
      shares.forall(s => s >= 0.0 && s <= 1.0) &&
        shares.zip(shares.drop(1)).forall { case (a, b) => a <= b }
    }

    val createdTotal = mart.map(_.getAs[Long]("created_count")).sum
    val defectCreated = issues.count(i => i.kind == "defect")

    val pctOk = mart.forall { r =>
      (d(r, "median_resolution_hours"), d(r, "p90_resolution_hours")) match {
        case (Some(m), Some(p)) => m <= p + 1e-9
        case (None, None)       => true
        case _                  => false
      }
    }

    recurrence && sharesOk && (createdTotal == defectCreated.toLong) && pctOk
  }
}
