package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Executed-plan introspection shared by self-gating queries and specs:
  * collect every [[BatchScanExec]], descending through the AQE wrappers
  * that hide scans from a plain `collect` (stage leaves carry their plan
  * as a field, not a child).
  */
object PlanScans {
  def batchScans(p: SparkPlan): Seq[BatchScanExec] = {
    val here = p match {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => batchScans(a.executedPlan)
      case q: QueryStageExec => batchScans(q.plan)
      case r: ReusedExchangeExec => batchScans(r.child)
      case _ => Nil
    }
    here ++ p.children.flatMap(batchScans)
  }
}
