package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Median, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: opt-in "approx mode" for percentiles — rewrite exact
  * `percentile(x, p)` / `median(x)` aggregates to the Greenwald-Khanna
  * sketch (`approx_percentile`).
  *
  * Exact percentiles are the OTHER accidental scale-killer next to
  * count-distinct ([[ApproxDistinctRewrite]]): Spark's `Percentile` (and
  * `Median`, its p=0.5 alias) buffers every value per group in an
  * OpenHashMap — memory O(distinct values per group), the shape that OOMs
  * on the first wide group at 100 TB. `ApproximatePercentile` holds a
  * fixed-size GK summary with map-side partials instead. The
  * `percentile_approx` function fixes call sites one at a time; this rule
  * fixes the PLAN, so existing SQL and DataFrame code get the sketch
  * shape with no rewrite — the same session-flag contract as the other
  * graft rules.
  *
  * Enabled by setting `spark.graft.approx.percentile` to the GK accuracy
  * (positive int; error ≤ 1/accuracy, 10000 = the function's default).
  * Unset → no-op. Scope rules:
  *  - only DOUBLE-typed exact frequencies rewrite untouched in place;
  *    the percentage expression is reused verbatim (scalar or array —
  *    ApproximatePercentile accepts both, so multi-quantile calls keep
  *    their array result type);
  *  - `Percentile`'s 3-arg frequency form (per-row weights) has no sketch
  *    equivalent — left exact;
  *  - FILTER clauses and DISTINCT flags are preserved on the
  *    AggregateExpression; aliases/exprIds are unchanged, so schemas and
  *    downstream operators never notice. Result type matches
  *    (DOUBLE / ARRAY<DOUBLE> for numeric input on both functions).
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  private val Key = "spark.graft.approx.percentile"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val accStr = conf.getConfString(Key, "")
    if (accStr.isEmpty) return plan
    val acc = accStr.toInt
    require(acc > 0, s"$Key must be a positive accuracy (error <= 1/accuracy), got $accStr")
    val accLit = Literal(acc, IntegerType)
    plan.transform {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(p: Percentile, _, _, _, _)
            if p.frequencyExpression == Literal(1L) =>
          ae.copy(aggregateFunction =
            new ApproximatePercentile(p.child, p.percentageExpression, accLit))
        case ae @ AggregateExpression(m: Median, _, _, _, _) =>
          ae.copy(aggregateFunction =
            new ApproximatePercentile(m.child, Literal(0.5), accLit))
      }
    }
  }
}
