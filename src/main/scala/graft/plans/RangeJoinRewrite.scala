package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a pure range join (inner join whose only
  * condition sandwiches one side's numeric expression between two bounds
  * from the other side — NO equality conjunct) into the domain-bucketed
  * plan of [[graft.operators.RangeJoin]], automatically.
  *
  * Without an equality conjunct Spark can only plan
  * BroadcastNestedLoopJoin — every point row against every interval row.
  * The explicit operator fixes call sites one at a time; this rule fixes
  * the PLAN, so existing SQL (`FROM points JOIN intervals ON lo <= p AND
  * p <= hi`) and DataFrame code get the scale shape with no rewrite —
  * the `SparkSessionExtensions` use case the engine reserves for
  * semantics the declarative API can't reach (SURVEY §4b).
  *
  * Shape of the rewrite (exactness does not depend on the width):
  *  - left gains `floor(p / w)` as a bucket column;
  *  - right explodes to `sequence(floor(lo/w), max(floor(hi/w),
  *    floor(lo/w)))` — every bucket its interval covers;
  *  - the join becomes bucket-equality AND the ORIGINAL condition as a
  *    residual. A point lies in exactly one bucket, so each qualifying
  *    pair meets exactly once; non-qualifying bucket collisions die on
  *    the residual. Strict (<, >) bounds are safe for the same reason —
  *    the covered-bucket span only ever over-approximates.
  *
  * Enabled by setting `spark.graft.rangeJoin.bucketWidth` (a positive
  * double — the value-domain bucket width; intervals wider than it simply
  * explode to more buckets). Unset → the rule is a no-op. The rewritten
  * join carries an equality conjunct, so the rule never re-fires on its
  * own output. Attach with `spark.experimental.extraOptimizations` or the
  * [[graft.functions.expressions.GraftSparkExtensions]] injector.
  *
  * A width far below the interval spans would explode each interval into
  * huge bucket arrays (multiplying the interval side's row count, or dying
  * mid-job on Spark's array-length ceiling). Unlike
  * [[graft.operators.RangeJoin.pointInInterval]], which derives width ≥ max
  * span from the data, this rule only sees the plan — so it guards instead:
  * any interval covering more than `spark.graft.rangeJoin.maxBucketsPerInterval`
  * buckets (default 4096) fails fast with a message naming the width to
  * raise, rather than silently inflating the job. The cap never drops pairs:
  * under it the explosion is complete, over it the job errors.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  private val CapKey = "spark.graft.rangeJoin.maxBucketsPerInterval"

  /** (point, bound, pointIsLhsOfOriginal, lower?) for one comparison,
    * oriented so `point` comes from `pointSide` and `bound` from the
    * other side. */
  private def orient(cmp: Expression, pointSide: AttributeSet,
                     boundSide: AttributeSet): Option[(Expression, Expression, Boolean)] = {
    def from(e: Expression, s: AttributeSet) =
      e.references.nonEmpty && e.references.subsetOf(s) && e.deterministic
    val parts = cmp match {
      case GreaterThanOrEqual(a, b) => Some((a, b, true))  // a >= b
      case GreaterThan(a, b)        => Some((a, b, true))
      case LessThanOrEqual(a, b)    => Some((a, b, false)) // a <= b
      case LessThan(a, b)           => Some((a, b, false))
      case _ => None
    }
    parts.flatMap { case (a, b, aIsGreater) =>
      if (from(a, pointSide) && from(b, boundSide))
        // point >= bound → lower; point <= bound → upper
        Some((a, b, aIsGreater))
      else if (from(b, pointSide) && from(a, boundSide))
        // bound >= point → upper; bound <= point → lower
        Some((b, a, !aIsGreater))
      else None
    }
  }

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  /** (point, lo, hi) if `cond` is exactly two bounds sandwiching one
    * point expression from `pointSide`. */
  private def sandwich(cond: Expression, pointSide: AttributeSet,
                       boundSide: AttributeSet): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(c1, c2) =>
        (orient(c1, pointSide, boundSide), orient(c2, pointSide, boundSide)) match {
          case (Some((p1, b1, lower1)), Some((p2, b2, lower2)))
              if p1.semanticEquals(p2) && lower1 != lower2 &&
                numeric(p1) && numeric(b1) && numeric(b2) =>
            if (lower1) Some((p1, b1, b2)) else Some((p1, b2, b1))
          case _ => None
        }
      case _ => None
    }

  private def bucketOf(e: Expression, width: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(width))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "").trim
    if (width.isEmpty) return plan
    val w = width.toDouble
    require(w > 0, s"$WidthKey must be positive, got $w")
    val cap = conf.getConfString(CapKey, "4096").trim.toLong
    require(cap > 0, s"$CapKey must be positive, got $cap")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && sandwich(cond, left.outputSet, right.outputSet).isDefined ||
             j.resolved && sandwich(cond, right.outputSet, left.outputSet).isDefined =>
        // orient so the POINT side is `pts` and the interval side `ivs`
        val (pts, ivs, pointOnLeft, trip) =
          sandwich(cond, left.outputSet, right.outputSet) match {
            case Some(t) => (left, right, true, t)
            case None => (right, left, false,
              sandwich(cond, right.outputSet, left.outputSet).get)
          }
        val (p, lo, hi) = trip
        val pBucket = Alias(bucketOf(p, w), "__rj_pb")()
        val ptsB = Project(pts.output :+ pBucket, pts)
        val loB = bucketOf(lo, w)
        val hiB0 = bucketOf(hi, w)
        // guard: an interval spanning more than `cap` buckets means the
        // configured width is far below the data's spans — fail with the
        // fix named instead of exploding the interval side
        val span = Subtract(hiB0, loB)
        val capMsg = Concat(Seq(
          Literal("graft range-join rewrite: an interval covers "),
          Cast(span, org.apache.spark.sql.types.StringType),
          Literal(s" buckets at $WidthKey=$w, exceeding $CapKey=$cap; " +
            "raise the width (or use RangeJoin.pointInInterval, which " +
            "derives width >= max span from the data)")))
        val hiB = If(LessThanOrEqual(span, Literal(cap)),
          hiB0, Cast(new RaiseError(capMsg), LongType))
        // Sequence is TimeZoneAwareExpression (date sequences exist): it
        // only resolves with a zone pinned, even for integral bounds
        val seq = new Sequence(loB, Greatest(Seq(hiB, loB)), Literal(1L))
          .withTimeZone(conf.sessionLocalTimeZone)
        val ivBucket = AttributeReference("__rj_ib", LongType,
          nullable = seq.dataType.asInstanceOf[ArrayType].containsNull)()
        val ivsB = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(ivBucket), child = ivs)
        val equi = EqualTo(pBucket.toAttribute, ivBucket)
        val (newLeft, newRight) = if (pointOnLeft) (ptsB, ivsB) else (ivsB, ptsB)
        val rewritten = Join(newLeft, newRight, Inner, Some(And(equi, cond)), hint)
        Project(left.output ++ right.output, rewritten)
    }
  }
}
