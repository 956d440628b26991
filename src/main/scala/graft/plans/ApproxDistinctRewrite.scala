package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: opt-in "approx mode" — rewrite exact
  * `count(DISTINCT x)` aggregates to HLL++ (`approx_count_distinct`).
  *
  * Exact distinct counting over 100 TB is the canonical accidental
  * scale-killer: one `count(DISTINCT user_id)` in a dashboard query means
  * shuffling every distinct key (and with grouped multi-distinct, an
  * Expand that multiplies the input). The sketch answer is a fixed-size
  * buffer with map-side partials and is what the big warehouses expose as
  * an "approx mode" session flag. The `graft.functions.Sketches` helpers
  * fix call sites one at a time; this rule fixes the PLAN, so existing
  * SQL and DataFrame code get the sketch shape with no rewrite — the same
  * contract as [[RangeJoinRewrite]].
  *
  * Enabled by setting `spark.graft.approx.countDistinct` to the target
  * relative standard deviation (e.g. "0.05"). Unset → no-op. Scope rules:
  *  - only `Count` with ONE argument rewrites (multi-arg count-distinct
  *    counts distinct tuples; HLL++ takes one child — left exact);
  *  - FILTER clauses are preserved (the AggregateExpression keeps its
  *    filter, only the function swaps);
  *  - result stays BIGINT and keeps its alias/exprId, so downstream
  *    operators and schemas are unchanged.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private val Key = "spark.graft.approx.countDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val rsdStr = conf.getConfString(Key, "")
    if (rsdStr.isEmpty) return plan
    val rsd = rsdStr.toDouble
    require(rsd > 0.0 && rsd < 0.37, // HLL++ supports rsd < 1/sqrt(2^4)*1.04/.. ≈ 0.37
      s"$Key must be a relative standard deviation in (0, 0.37), got $rsdStr")
    plan.transform {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(Count(children), _, true, _, _)
            if children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(children.head, rsd),
            isDistinct = false)
      }
    }
  }
}
