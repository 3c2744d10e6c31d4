package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Decontamination

/** Decontamination contract: verbatim-copied eval text flags its corpus
  * twin, sub-threshold overlap survives, the anti-join removes exactly the
  * flagged docs, and the overlap join is a broadcast equi-join.
  */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  // 3-gram shingles; "alpha beta gamma delta epsilon zeta" has 4
  private val evalDoc = "alpha beta gamma delta epsilon zeta"
  private def corpus = Seq(
    (1L, evalDoc + " eta theta"),      // superset: shares all 4 eval shingles
    (2L, "alpha beta gamma nothing"),  // shares 1 shingle — below threshold
    (3L, "totally unrelated words over here")).toDF("doc_id", "text")
  private def eval = Seq((100L, evalDoc)).toDF("doc_id", "text")

  test("verbatim inclusion is flagged with the full shingle overlap") {
    val pairs = Decontamination.contaminatedPairs(corpus, eval, n = 3,
      minOverlap = 2).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 100L, 4L)))
  }

  test("decontaminate removes exactly the flagged docs") {
    val kept = Decontamination.decontaminate(corpus, eval, n = 3,
      minOverlap = 2).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // with the bar at 1 shared shingle, doc 2 goes too
    val strict = Decontamination.decontaminate(corpus, eval, n = 3,
      minOverlap = 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict == Set(3L))
  }

  test("overlap join broadcasts the eval side; never a cross product") {
    val p = Decontamination.contaminatedPairs(corpus, eval, n = 3,
      minOverlap = 2).queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
