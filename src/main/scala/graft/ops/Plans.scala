package graft.ops

import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan introspection shared by the specs and the audit tools —
  * THE one AQE-aware walker (SparkSpec.collectPlanNodes and the tools
  * delegate here; per-site copies once dropped the subquery recursion).
  */
object Plans {

  /** Every physical node of an executed plan, unwrapping AQE and recursing
    * into subqueries. `TreeNode.collect` treats `AdaptiveSparkPlanExec` as
    * a leaf and silently finds nothing under AQE; materialized AQE stages
    * (Shuffle/Broadcast/ResultQueryStage) hold their subtree in `plan`,
    * not `children` — without those cases every plan-shape assertion sees
    * a single opaque leaf and passes vacuously.
    */
  def collectNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val self = plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        collectNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectNodes(q.plan)
      case p => Seq(p)
    }
    self ++ plan.children.flatMap(collectNodes) ++
      plan.subqueries.flatMap(collectNodes)
  }
}
