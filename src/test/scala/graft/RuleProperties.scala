package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Silver
import graft.rules.IssueRules

/** Property-based invariants for the rule engine over random label arrays
  * (known + unknown labels, any order):
  *   - kind = "defect" ⟺ a bug label is present;
  *   - tier = "P0" ⟺ a P0 label is present (even for non-defects);
  *   - tier = "P2" ⟹ bug label present;
  *   - component is never null and never a meta label (it is either a
  *     prefix-derived string, an allowlist member, a non-meta label, or
  *     "other");
  *   - empty labels ⇒ ("other", "NA", "other").
  */
object RuleProperties extends Properties("Rules") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = GraftSession.builder("rule-props", cores = 4).getOrCreate()

  private val rules = IssueRules.reference
  private val pool: Seq[String] =
    rules.kindBug ++ rules.kindDocs ++ rules.kindEnhancement ++
      rules.kindQuestion ++ rules.p0Labels ++ rules.p1Labels ++
      rules.processLabels ++ rules.componentAllowlist.take(5) ++
      Seq("component: io", "area: foo: bar", "module:x", "randolabel", "zzz")

  private val genLabels: Gen[List[String]] = for {
    n <- Gen.choose(0, 6)
    ls <- Gen.listOfN(n, Gen.oneOf(pool))
  } yield ls

  private val genBatch: Gen[List[List[String]]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, genLabels))

  property("rule-engine invariants") = Prop.forAll(genBatch) { batch =>
    val sp = spark
    import sp.implicits._
    val df = batch.zipWithIndex.map { case (ls, i) => (i.toLong, ls) }
      .toDF("id", "labels_arr")
      .withColumn("kind", Silver.ticketKind(col("labels_arr")))
      .withColumn("tier", Silver.priorityTier(col("labels_arr"), col("kind")))
      .withColumn("comp", Silver.component(col("labels_arr")))
    val rows: Map[Long, Row] =
      df.collect().map(r => r.getAs[Long]("id") -> r).toMap

    batch.zipWithIndex.forall { case (ls, i) =>
      val r = rows(i.toLong)
      val kind = r.getAs[String]("kind")
      val tier = r.getAs[String]("tier")
      val comp = r.getAs[String]("comp")
      val hasBug = ls.exists(rules.kindBug.contains)
      val hasP0 = ls.exists(rules.p0Labels.contains)
      val hasP1 = ls.exists(rules.p1Labels.contains)

      ((kind == "defect") == hasBug) &&
        ((tier == "P0") == hasP0) &&
        (tier != "P2" || hasBug) &&
        (tier != "P1" || (hasP1 && !hasP0)) &&
        (comp != null) && !rules.metaLabels.contains(comp) &&
        (ls.nonEmpty || (kind == "other" && tier == "NA" && comp == "other"))
    }
  }
}
