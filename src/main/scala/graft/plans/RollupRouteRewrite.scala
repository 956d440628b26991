package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Divide, Expression, If, IsNull, Literal, NamedExpression, RaiseError, Remainder, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: MATERIALIZED-ROLLUP ROUTING — the seventh member of the
  * rewrite family. Aggregates over the raw fact table are served from the
  * sum/count/min/max rollup `Layout.incrementalRollup` maintains, when the
  * requested grain is derivable from the rollup's grain.
  *
  * This is the capability OLAP stores (Druid, Pinot, BigQuery MVs) build
  * whole subsystems for: dashboards keep issuing `GROUP BY bucket` SQL
  * against raw events, and the engine transparently answers from a table
  * thousands of times smaller. Correct because the rollup's aggregates are
  * MERGEABLE (the TS-ROLLUP-CASCADE contract): sum-of-sums, sum-of-counts,
  * min-of-mins, max-of-maxes at any coarser bucket equal the raw
  * aggregates (double sums re-associate — the one deviation, inherent to
  * every rollup store; counts/min/max are exact).
  *
  * Enabled by `spark.graft.rollup.route` =
  * `rawPath;rollupPath;partitionCol;valueCol;group1,group2;grainSeconds`.
  * Unset → no-op. Scope rules (conservative — anything else keeps its
  * plan):
  *  - the aggregate's child must be a scan of `rawPath`, optionally
  *    beneath a column-pruning Project and/or a Filter that touches ONLY
  *    dimension/partition columns (the dashboard time-range shape routes;
  *    a value filter means pre-aggregation semantics and aborts);
  *  - every grouping expression is a rollup group column, the partition
  *    column itself, or the bucket shape `pc - (pc % G)` with `G` a
  *    multiple of the rollup grain;
  *  - every aggregate is `sum(valueCol)`, `count(*)` / `count(1)`,
  *    `min(valueCol)`, `max(valueCol)`, or `avg(valueCol)` — avg is
  *    served as sum(sv)/sum(c), the mergeable decomposition;
  *  - output names and exprIds are preserved, so parents and schemas are
  *    unchanged.
  */
object RollupRouteRewrite extends Rule[LogicalPlan] {

  private val Key = "spark.graft.rollup.route"

  private final case class Route(rawPath: String, rollupPath: String,
      partitionCol: String, valueCol: String, groupCols: Seq[String],
      grain: Long)

  private def parse(v: String): Route = {
    val parts = v.split(";", -1)
    require(parts.length == 6,
      s"$Key must be rawPath;rollupPath;partitionCol;valueCol;groups;grain, got '$v'")
    Route(parts(0), parts(1), parts(2), parts(3),
      parts(4).split(",").map(_.trim).filter(_.nonEmpty).toSeq, parts(5).toLong)
  }

  /** True if this plan is the raw-path relation itself. The match is
    * anchored at a path-separator boundary: a configured rawPath "events"
    * must NOT match an unrelated ".../other_events" (an unanchored
    * endsWith would route that table's aggregates to the wrong rollup). */
  private def isScan(plan: LogicalPlan, path: String): Boolean = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val want = path.stripSuffix("/").stripPrefix("file:")
      fs.location.rootPaths.exists { rp =>
        val p = rp.toString.stripSuffix("/").stripPrefix("file:")
        p == want || p.endsWith("/" + want)
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val v = conf.getConfString(Key, "")
    if (v.isEmpty) return plan
    val route = parse(v)
    val session = SparkSession.active

    plan.transform {
      case agg @ Aggregate(_, _, Project(projs, scan), _)
          if isScan(scan, route.rawPath) =>
        rewrite(agg, projs, None, scan, route, session).getOrElse(agg)
      case agg @ Aggregate(_, _, Project(projs, Filter(cond, scan)), _)
          if isScan(scan, route.rawPath) =>
        rewrite(agg, projs, Some(cond), scan, route, session).getOrElse(agg)
      case agg @ Aggregate(_, _, Filter(cond, scan), _)
          if isScan(scan, route.rawPath) =>
        rewrite(agg, scan.output, Some(cond), scan, route, session).getOrElse(agg)
      case agg @ Aggregate(_, _, scan, _) if isScan(scan, route.rawPath) =>
        rewrite(agg, scan.output, None, scan, route, session).getOrElse(agg)
    }
  }

  /** cnn with a LOUD mixed-layout guard: a rollup dir incrementally
    * refreshed by newer code can hold pre-cnn partitions whose rows read
    * cnn as NULL — a bare Sum(cnn) would silently skip them (inflated
    * avg, undercounted count(value)), and substituting the row count `c`
    * would silently OVERCOUNT null values. Neither silent answer is
    * acceptable for an optimizer that promises result-identical routing,
    * so a null cnn fails fast naming the fix; the rollup table is tiny,
    * so the per-row If costs nothing. */
  private def guardedCnn(cnn: Attribute, route: Route): Expression =
    If(IsNull(cnn),
      Cast(new RaiseError(Literal(
        s"graft rollup routing: the rollup at ${route.rollupPath} has " +
          "pre-cnn partitions (cnn IS NULL), so avg/count(value) cannot " +
          "be served exactly; rebuild it with Layout.incrementalRollup " +
          s"or unset $Key")), LongType),
      cnn)

  private def rewrite(agg: Aggregate, projs: Seq[NamedExpression],
                      filterCond: Option[Expression], scan: LogicalPlan,
                      route: Route, session: SparkSession): Option[LogicalPlan] = {
    // by this phase complex grouping keys are already extracted into the
    // child Project (PullOutGroupingExpressions) — require plain attrs
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None

    val rollup = session.read.parquet(route.rollupPath).queryExecution.analyzed
    def rollupAttr(name: String): Option[Attribute] =
      rollup.output.find(_.name.equalsIgnoreCase(name))
    val (svA, cA, mnA, mxA) =
      (rollupAttr("sv"), rollupAttr("c"), rollupAttr("mn"), rollupAttr("mx")) match {
        case (Some(a), Some(b), Some(x), Some(y)) => (a, b, x, y)
        case _ => return None // not an incrementalRollup layout
      }
    // non-null value count (newer incrementalRollup layouts) — required to
    // route avg/count(value) exactly when valueCol is nullable
    val cnnA = rollupAttr("cnn")
    val pcRaw = scan.output.find(_.name.equalsIgnoreCase(route.partitionCol))
      .getOrElse(return None)
    val pcRoll = rollupAttr(route.partitionCol).getOrElse(return None)
    if (pcRoll.dataType != pcRaw.dataType) return None
    val valAttr = scan.output.find(_.name.equalsIgnoreCase(route.valueCol))
      .getOrElse(return None)
    val routable = (route.groupCols :+ route.partitionCol).map(_.toLowerCase).toSet

    // the derivable bucket shape pc - (pc % G), G a grain multiple,
    // re-expressed over the rollup partition column
    def txBucket(e: Expression): Option[Expression] = e match {
      case Subtract(a: Attribute, Remainder(b: Attribute, lit @ Literal(g, _), _), _)
          if a.semanticEquals(pcRaw) && b.semanticEquals(pcRaw) =>
        val width = g match {
          case l: Long => l
          case i: Int => i.toLong
          case _ => return None
        }
        if (width > 0 && width % route.grain == 0)
          Some(Subtract(pcRoll, Remainder(pcRoll, lit)))
        else None
      case _ => None
    }

    // translate the pruning Project: group/partition attrs re-alias the
    // rollup columns UNDER THEIR ORIGINAL exprIds (parents unchanged);
    // extracted bucket aliases translate; the value column drops (the
    // aggregate functions below swap to the rollup aggregate columns)
    val newProjs: Seq[NamedExpression] = projs.flatMap {
      case a: AttributeReference if routable(a.name.toLowerCase) =>
        val r = rollupAttr(a.name).getOrElse(return None)
        if (r.dataType != a.dataType) return None
        Some(Alias(r, a.name)(exprId = a.exprId))
      case a: AttributeReference if a.semanticEquals(valAttr) => None
      case al @ Alias(e, name) =>
        txBucket(e) match {
          case Some(t) => Some(Alias(t, name)(exprId = al.exprId,
            qualifier = al.qualifier, explicitMetadata = Some(al.metadata)))
          case None => return None
        }
      case _ => return None
    } ++ Seq(svA, cA, mnA, mxA) ++ cnnA

    // a filter routes iff it touches only dimension/partition columns —
    // then it prunes rollup rows exactly as it pruned raw rows (any
    // reference to the value column means pre-aggregation semantics the
    // rollup no longer has)
    val groupAttrMap: Map[String, Attribute] =
      (route.groupCols :+ route.partitionCol).flatMap { g =>
        rollupAttr(g).map(g.toLowerCase -> _)
      }.toMap
    val newFilter: Option[Expression] = filterCond match {
      case None => None
      case Some(cond) =>
        // every referenced column must BOTH be a configured group column
        // AND actually exist in the rollup table — a stale rollup layout
        // missing a configured column must fall back to the raw plan,
        // never crash the optimizer with an unguarded Map lookup
        if (!cond.references.forall(a =>
            routable(a.name.toLowerCase) &&
              groupAttrMap.contains(a.name.toLowerCase)))
          return None
        Some(cond.transform {
          case a: Attribute if groupAttrMap.contains(a.name.toLowerCase) =>
            groupAttrMap(a.name.toLowerCase)
        })
    }

    // swap each aggregate function for its mergeable rollup twin; avg is
    // served as sum(sv)/sum(c) — the mergeable decomposition every rollup
    // store uses
    var ok = true
    val newAggs = agg.aggregateExpressions.map { ne =>
      ne.transform {
        // avg(value) divides by the count of NON-NULL values, so it routes
        // as Sum(sv)/Sum(cnn) — falling back to the row count `c` only when
        // the value column is provably non-nullable (then cnn == c). Both
        // Divide operands are cast to double explicitly: the optimizer does
        // not re-run type coercion, and Sum(sv) is LongType for integral
        // value columns. Decimal-typed avg keeps its plan (output type would
        // change).
        case ae @ AggregateExpression(Average(v, _), _, false, None, _)
            if v.semanticEquals(valAttr) && ae.dataType == DoubleType &&
               (cnnA.isDefined || !valAttr.nullable) =>
          Divide(
            Cast(ae.copy(aggregateFunction = Sum(svA)), DoubleType),
            Cast(ae.copy(aggregateFunction =
              Sum(cnnA.map(guardedCnn(_, route)).getOrElse(cA)),
              resultId = NamedExpression.newExprId), DoubleType))
        case ae @ AggregateExpression(f, _, false, None, _) =>
          f match {
            case Sum(v, _) if v.semanticEquals(valAttr) =>
              ae.copy(aggregateFunction = Sum(svA))
            case Count(Nil) => ae.copy(aggregateFunction = Sum(cA))
            case Count(Seq(Literal(_, _))) => ae.copy(aggregateFunction = Sum(cA))
            case Count(Seq(v)) if v.semanticEquals(valAttr) &&
                (cnnA.isDefined || !valAttr.nullable) =>
              // count(value) skips nulls → the non-null rollup count
              // (null-guarded like avg's denominator)
              ae.copy(aggregateFunction =
                Sum(cnnA.map(guardedCnn(_, route)).getOrElse(cA)))
            case Min(v) if v.semanticEquals(valAttr) =>
              ae.copy(aggregateFunction = Min(mnA))
            case Max(v) if v.semanticEquals(valAttr) =>
              ae.copy(aggregateFunction = Max(mxA))
            case _ =>
              // transformDown revisits the aggregates we just produced
              // (e.g. inside avg's Divide) — those reference rollup
              // columns and are already correct
              val translated = (Set(svA, cA, mnA, mxA) ++ cnnA).map(_.exprId)
              if (!f.references.forall(r => translated(r.exprId))) ok = false
              ae
          }
      }.asInstanceOf[NamedExpression]
    }
    // any surviving raw-value reference means something we cannot serve
    if (!ok || newAggs.exists(_.references.contains(valAttr))) return None
    val routedChild = newFilter match {
      case Some(c) => Filter(c, rollup)
      case None => rollup
    }
    Some(Aggregate(agg.groupingExpressions, newAggs,
      Project(newProjs, routedChild), agg.hint))
  }
}
