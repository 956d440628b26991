package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Last, Max}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the as-of-join SQL shape — a theta join on
  * `key-equality AND r.ts <= l.ts` collapsed by a `max(...)` aggregate over
  * right-side values — into the union + running-window plan of
  * [[graft.operators.AsOfJoin]], automatically.
  *
  * The SQL a user naturally writes for "the most recent right-side row at or
  * before each left row" (last-value-before, point-in-time joins, last-touch
  * attribution — the highest-frequency scale-killer shape in a metrics
  * engine's domain) is:
  *
  * {{{
  *   SELECT l.id, max(struct(r.ts, r.payload))...
  *   FROM l LEFT JOIN r ON l.k = r.k AND r.ts <= l.ts
  *   GROUP BY l.id
  * }}}
  *
  * Spark plans that as a key-equality join whose inequality rides as a
  * residual: every left row pairs with EVERY earlier right row of its key
  * before the aggregate collapses them — O(|L|·|R|) per key. The explicit
  * operator (`AsOfJoin.lastBefore[With]`) fixes call sites one at a time;
  * this rule fixes the PLAN, completing the rewrite trio begun by
  * [[RangeJoinRewrite]] and [[ApproxDistinctRewrite]]: union both sides,
  * one running `last(value) ignore nulls` over a window partitioned by key
  * and sorted by (ts, side, value) — O(n log n) in one shuffle, no pair
  * blow-up, skewed keys spill in the sort instead of materializing pairs.
  *
  * Exactness conditions (the rule fires ONLY when all hold):
  *  - join type Inner or LeftOuter; condition = equality conjunct(s) plus
  *    exactly ONE inequality ordering a right-side timestamp against a
  *    left-side one (either strictness, either writing direction);
  *  - grouping expressions reference only the left side;
  *  - every aggregate function is `max` (no FILTER clause) over one shared
  *    right-side expression `e` that is ts-monotone: the ts itself, an
  *    order-preserving cast of it (numeric/timestamp/date), or a struct
  *    whose FIRST field is such — so `max(e)` over the qualifying set equals
  *    `e` of the last qualifying row, which is what the running window
  *    computes. (`max(-ts)` or `max(payload)` alone would NOT be last-row
  *    values; the rule leaves those plans untouched.)
  *
  * Max-of-per-row-maxes equals max-over-all-pairs, so ANY left-side grouping
  * is exact, not just by a unique key. Null keys never match in the join but
  * WOULD co-partition in the window, so null-key/null-ts right rows are
  * filtered out of the union (left rows with null key then see an empty
  * window → null, exactly the join's answer). Inner joins drop left rows
  * with no match: a `WHERE asof IS NOT NULL` replicates that.
  *
  * Enabled by `spark.graft.asofJoin.rewrite=true`; unset → no-op. The
  * rewritten Aggregate's child is no longer a Join, so the rule never
  * re-fires on its own output. Attach with
  * `spark.experimental.extraOptimizations` or the
  * [[graft.functions.expressions.GraftSparkExtensions]] injector.
  */
object AsOfJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val Key = "spark.graft.asofJoin.rewrite"

  /** One-sided deterministic expression test. */
  private def from(e: Expression, s: AttributeSet): Boolean =
    e.references.nonEmpty && e.references.subsetOf(s) && e.deterministic

  /** `(lTs, rTs, strict)` if `cmp` orders a right-side expression at or
    * before a left-side one. */
  private def asOfBound(cmp: Expression, lSet: AttributeSet,
                        rSet: AttributeSet): Option[(Expression, Expression, Boolean)] =
    cmp match {
      case LessThanOrEqual(r, l) if from(r, rSet) && from(l, lSet) => Some((l, r, false))
      case LessThan(r, l)        if from(r, rSet) && from(l, lSet) => Some((l, r, true))
      case GreaterThanOrEqual(l, r) if from(r, rSet) && from(l, lSet) => Some((l, r, false))
      case GreaterThan(l, r)        if from(r, rSet) && from(l, lSet) => Some((l, r, true))
      case _ => None
    }

  /** `(lKey, rKey)` if `cmp` is a cross-side equality. */
  private def equiPair(cmp: Expression, lSet: AttributeSet,
                       rSet: AttributeSet): Option[(Expression, Expression)] =
    cmp match {
      case EqualTo(a, b) if from(a, lSet) && from(b, rSet) => Some((a, b))
      case EqualTo(a, b) if from(b, lSet) && from(a, rSet) => Some((b, a))
      case _ => None
    }

  private def orderPreservingCast(dt: DataType): Boolean = dt match {
    case _: NumericType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** Is `max(e)` over any qualifying set the value of the LAST qualifying
    * row under (ts, e) ordering? True when e is ts, an order-preserving
    * cast of ts, or a struct led by such. */
  private def tsMonotone(e: Expression, rTs: Expression): Boolean = e match {
    case _ if e.semanticEquals(rTs) => true
    case c: Cast => orderPreservingCast(c.dataType) && tsMonotone(c.child, rTs)
    case s: CreateNamedStruct => s.valExprs.nonEmpty && tsMonotone(s.valExprs.head, rTs)
    case _ => false
  }

  /** Skip pure-pruning Projects between the Aggregate and the Join. */
  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) => unwrap(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(Key, "").trim != "true") return plan
    plan.transform {
      case agg @ Aggregate(_, _, _, _) if agg.resolved =>
        unwrap(agg.child) match {
          case j @ Join(_, _, Inner | LeftOuter, Some(_), _) =>
            rewrite(agg, j).getOrElse(agg)
          case _ => agg
        }
    }
  }

  private def rewrite(agg: Aggregate, join: Join): Option[LogicalPlan] = {
    val left = join.left
    val right = join.right
    val lSet = left.outputSet
    val rSet = right.outputSet

    // --- decompose the join condition: N equalities + exactly one bound
    val conjuncts = splitConjunctivePredicates(join.condition.get)
    val bounds = conjuncts.flatMap(asOfBound(_, lSet, rSet))
    val equis = conjuncts.flatMap(equiPair(_, lSet, rSet))
    if (bounds.size != 1 || equis.isEmpty ||
        equis.size + bounds.size != conjuncts.size) return None
    val (lTs, rTs, strict) = bounds.head
    if (lTs.dataType != rTs.dataType) return None
    if (equis.exists { case (lk, rk) => lk.dataType != rk.dataType }) return None

    // --- grouping must be left-only; aggregates all max over one shared
    //     ts-monotone right-side expression
    if (!agg.groupingExpressions.forall(g => g.references.subsetOf(lSet) && g.deterministic))
      return None
    val aggFns = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    if (aggFns.isEmpty) return None
    val maxArg: Expression = aggFns.head match {
      case AggregateExpression(Max(e), _, _, None, _) => e
      case _ => return None
    }
    val ok = aggFns.forall {
      case AggregateExpression(Max(e), _, _, None, _) => e.semanticEquals(maxArg)
      case _ => false
    }
    if (!ok || !from(maxArg, rSet) || !tsMonotone(maxArg, rTs)) return None

    // --- build: union(left+nulls, right-values) → running last() window
    val leftSide = if (strict) 0 else 1 // at equal ts, include rights iff <=
    val rightSide = 1 - leftSide
    val n = left.output.size

    val leftProj = Project(
      left.output ++
        equis.zipWithIndex.map { case ((lk, _), i) => Alias(lk, s"__ak$i")() } ++
        Seq(Alias(lTs, "__ats")(),
          Alias(Literal(leftSide), "__aside")(),
          Alias(Literal.create(null, maxArg.dataType), "__aval")()),
      left)
    // null-key / null-ts right rows match nothing in the join; drop them so
    // they can't co-partition with null-key left rows in the window
    val rightKeep = (equis.map(_._2) :+ rTs).map(IsNotNull).reduce[Expression](And)
    val rightProj = Project(
      left.output.map(a => Alias(Literal.create(null, a.dataType), a.name)()) ++
        equis.zipWithIndex.map { case ((_, rk), i) => Alias(rk, s"__ak$i")() } ++
        Seq(Alias(rTs, "__ats")(),
          Alias(Literal(rightSide), "__aside")(),
          Alias(maxArg, "__aval")()),
      Filter(rightKeep, right))

    val union = Union(Seq(leftProj, rightProj))
    val uout = union.output
    val leftAttrs = uout.take(n)
    val keyAttrs: Seq[Expression] = uout.slice(n, n + equis.size)
    val tsAttr = uout(n + equis.size)
    val sideAttr = uout(n + equis.size + 1)
    val valAttr = uout(n + equis.size + 2)

    val order = Seq(SortOrder(tsAttr, Ascending), SortOrder(sideAttr, Ascending),
      SortOrder(valAttr, Ascending))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val asofAlias = Alias(
      WindowExpression(Last(valAttr, ignoreNulls = true).toAggregateExpression(),
        WindowSpecDefinition(keyAttrs, order, frame)), "__asof")()
    val win = Window(Seq(asofAlias), keyAttrs, order, union)
    val filtered = Filter(EqualTo(sideAttr, Literal(leftSide)), win)
    val asofAttr = asofAlias.toAttribute
    val projected = Project(leftAttrs :+ asofAttr, filtered)
    // inner join drops left rows with no qualifying right row
    val newChild =
      if (join.joinType == Inner) Filter(IsNotNull(asofAttr), projected) else projected

    val newAggExprs = agg.aggregateExpressions.map(_.transform {
      case ae @ AggregateExpression(Max(_), _, _, None, _) =>
        ae.copy(aggregateFunction = Max(asofAttr), isDistinct = false)
    }.asInstanceOf[NamedExpression])
    Some(agg.copy(aggregateExpressions = newAggExprs, child = newChild))
  }
}
