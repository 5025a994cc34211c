package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared AQE-aware plan traversal for the adaptive guards
  * (AdaptivePlanGuardSpec, SkewSpec) and the ScaleProbe pipeline census:
  * AQE wraps materialized stages in leaf `QueryStageExec` nodes that
  * `SparkPlan.collect` does not descend into, so a census of what
  * actually RAN must recurse through stages, reused exchanges, and
  * nested adaptive plans. */
object PlanWalk {

  /** Every physical node reachable from `p`, descending through the AQE
    * wrappers. Call only after the plan has executed (otherwise
    * `AdaptiveSparkPlanExec.executedPlan` is the initial, not final,
    * plan). */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: inner.flatMap(flatten)
  }

  /** Run the frame's OWN QueryExecution to completion (rows consumed on
    * executors — a `df.write` would build a separate QueryExecution and
    * leave this one unexecuted) and return the flattened FINAL plan. */
  def executeAndFlatten(df: DataFrame): Seq[SparkPlan] = {
    df.queryExecution.toRdd.foreachPartition(it => it.foreach(_ => ()))
    flatten(df.queryExecution.executedPlan)
  }
}
