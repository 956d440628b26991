package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, NamedExpression, SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: opt-in rewrite of UNPARTITIONED entire-frame aggregate
  * windows to a one-row global aggregate joined back — the fifth member of
  * the rewrite family (range join, count-distinct, as-of, percentile).
  *
  * `value / sum(value) OVER ()` — the ratio-to-total shape every BI tool
  * emits — plans as a Window with an EMPTY partitionSpec, which moves the
  * ENTIRE input to one task (a single-partition Exchange + WindowExec
  * that buffers the whole dataset). At 100 TB that one task is the job.
  * But when the frame is the whole partition, the window value is simply
  * the global aggregate: one row, computable with map-side partials on
  * every executor and a broadcast join back. Same rows, same schema —
  * strictly better plan. The `operators.GlobalWindow` helpers fix call
  * sites one at a time; this rule fixes the PLAN for existing SQL and
  * DataFrame code, the same contract as [[RangeJoinRewrite]].
  *
  * Enabled with `spark.graft.rewrite.globalWindow=true`. Unset → no-op.
  * Scope rules (conservative — anything else keeps its Window):
  *  - partitionSpec must be empty (partitioned windows already scale);
  *  - every window function in the node must be a DETERMINISTIC aggregate
  *    whose frame is UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING (a running
  *    frame — the default under ORDER BY — is order-sensitive state, and
  *    ranking/offset functions are not aggregates: all left untouched);
  *  - output attributes keep their exprIds, so parent operators, aliases
  *    and schemas are unchanged.
  *
  * The child subtree is referenced twice (probe side + aggregate input) —
  * two scans instead of one, but both distributed; the single-partition
  * sort-and-buffer the Window plan pays is gone. With the input cached or
  * scan-reused the second pass is marginal; at any size it beats one
  * executor holding the dataset.
  */
object GlobalWindowRewrite extends Rule[LogicalPlan] {

  private val Key = "spark.graft.rewrite.globalWindow"

  private def entireFrame(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing) => true
    case _ => false
  }

  /** The window expression as a global-aggregate alias (same exprId), if
    * this rule can serve it. */
  private def asGlobalAgg(e: NamedExpression): Option[NamedExpression] = e match {
    case a @ Alias(WindowExpression(ae: AggregateExpression,
        WindowSpecDefinition(Seq(), _, frame)), name)
        if ae.deterministic && entireFrame(frame) =>
      Some(Alias(ae, name)(exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(Key, "false").toBoolean) return plan
    plan.transform {
      case w @ Window(wes, Seq(), _, child, _) if wes.nonEmpty =>
        val aggs = wes.map(asGlobalAgg)
        if (aggs.forall(_.isDefined)) {
          // one-row aggregate (no grouping): the join is a broadcast of a
          // single row — output = child.output ++ original window attrs
          val agg = Aggregate(Nil, aggs.flatten, child)
          Join(child, agg, Cross, None, JoinHint.NONE)
        } else w
    }
  }
}
