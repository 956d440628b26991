package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType, StringType}

/** Optimizer rule: rewrite an interval-OVERLAP theta join (inner join whose
  * only condition is `aLo ≤ bHi AND bLo ≤ aHi` with the interval ends on
  * opposite sides — NO equality conjunct) into the canonical-cell grid plan
  * of [[graft.operators.RangeJoin.intervalOverlap]], automatically.
  *
  * The companion of [[RangeJoinRewrite]] for the two-interval case:
  * sessions × outages, presence × incidents. Without an equality conjunct
  * Spark plans BroadcastNestedLoopJoin — every A interval against every B
  * interval (OverlapScaleProbe: 68 s vs 5 s at 400k×800k, diverging
  * quadratically). Shape of the rewrite:
  *
  *  - BOTH sides explode to the grid cells their interval covers
  *    (`sequence(floor(lo/w), max(floor(hi/w), floor(lo/w)))`);
  *  - the join becomes cell-equality AND the ORIGINAL condition AND the
  *    canonical-cell conjunct `cell = floor(greatest(aLo, bLo)/w)`.
  *
  * Exactly-once without a dedup pass: for any pair satisfying the overlap
  * condition, `max(aLo, bLo)` lies inside both closed hulls (if the max is
  * aLo: bLo ≤ aLo and aLo ≤ bHi from the condition; symmetric otherwise),
  * so its cell is covered by both explosions — and it is ONE cell. Strict
  * bounds and degenerate hi<lo inputs ride the residual, which is the
  * original predicate verbatim.
  *
  * Shares `spark.graft.rangeJoin.bucketWidth` (and the per-interval bucket
  * cap) with RangeJoinRewrite — unset → no-op. The sandwich shape (both
  * bounds from ONE side around a point from the other) is RangeJoinRewrite's
  * territory and is explicitly skipped here, so the two rules never race.
  * The rewritten join carries an equality conjunct, so the rule never
  * re-fires on its own output.
  */
object IntervalOverlapRewrite extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"
  private val CapKey = "spark.graft.rangeJoin.maxBucketsPerInterval"

  /** Normalize any comparison to (small, big): `small ≤/< big`. */
  private def asLe(cmp: Expression): Option[(Expression, Expression)] = cmp match {
    case LessThanOrEqual(a, b)    => Some((a, b))
    case LessThan(a, b)           => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b)        => Some((b, a))
    case _ => None
  }

  private def from(e: Expression, s: AttributeSet) =
    e.references.nonEmpty && e.references.subsetOf(s) && e.deterministic

  private def numeric(e: Expression) = e.dataType.isInstanceOf[NumericType]

  /** (aLo, aHi, bLo, bHi) with a* from `left`, b* from `right`, if `cond`
    * is exactly the two-comparison overlap shape (and NOT a sandwich). */
  private def overlap(cond: Expression, left: AttributeSet,
                      right: AttributeSet): Option[(Expression, Expression, Expression, Expression)] =
    cond match {
      case And(c1, c2) =>
        (asLe(c1), asLe(c2)) match {
          case (Some((s1, b1)), Some((s2, b2))) =>
            // need one L≤R comparison and one R≤L comparison
            val lr = if (from(s1, left) && from(b1, right)) Some((s1, b1))
                     else if (from(s2, left) && from(b2, right)) Some((s2, b2))
                     else None
            val rl = if (from(s2, right) && from(b2, left)) Some((s2, b2))
                     else if (from(s1, right) && from(b1, left)) Some((s1, b1))
                     else None
            (lr, rl) match {
              case (Some((al, bh)), Some((bl, ah))) if !(al eq bl) =>
                // al ≤ bh (L→R), bl ≤ ah (R→L) ⇒ A=[al,ah], B=[bl,bh].
                // A point sandwich has al == ah (or bl == bh) — that is
                // RangeJoinRewrite's shape; skip it here.
                if (al.semanticEquals(ah) || bl.semanticEquals(bh)) None
                else if (Seq(al, ah, bl, bh).forall(numeric)) Some((al, ah, bl, bh))
                else None
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  private def bucketOf(e: Expression, w: Double): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "").trim
    if (width.isEmpty) return plan
    val w = width.toDouble
    require(w > 0, s"$WidthKey must be positive, got $w")
    val cap = conf.getConfString(CapKey, "4096").trim.toLong

    def cells(side: LogicalPlan, lo: Expression, hi: Expression,
              name: String): (LogicalPlan, Attribute) = {
      val loB = bucketOf(lo, w)
      val hiB0 = bucketOf(hi, w)
      val span = Subtract(hiB0, loB)
      val capMsg = Concat(Seq(
        Literal("graft interval-overlap rewrite: an interval covers "),
        Cast(span, StringType),
        Literal(s" buckets at $WidthKey=$w, exceeding $CapKey=$cap; raise " +
          "the width (or use RangeJoin.intervalOverlap, which derives " +
          "width >= max span from the data)")))
      // NULL-safe cap check: a null interval bound makes `span` null, and
      // If treats a null predicate as FALSE — without the IsNull guard the
      // RaiseError branch would fire and crash the query, where the
      // original theta join simply drops null-bound rows. With the guard a
      // null bound yields a null sequence, which Generate(outer=false)
      // drops — matching the original join's semantics exactly.
      val hiB = If(Or(IsNull(span), LessThanOrEqual(span, Literal(cap))),
        hiB0, Cast(new RaiseError(capMsg), LongType))
      val seq = new Sequence(loB, Greatest(Seq(hiB, loB)), Literal(1L))
        .withTimeZone(conf.sessionLocalTimeZone)
      val cell = AttributeReference(name, LongType,
        nullable = seq.dataType.asInstanceOf[ArrayType].containsNull)()
      (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(cell), child = side), cell)
    }

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && overlap(cond, left.outputSet, right.outputSet).isDefined =>
        val (al, ah, bl, bh) = overlap(cond, left.outputSet, right.outputSet).get
        val (lG, lCell) = cells(left, al, ah, "__ov_lc")
        val (rG, rCell) = cells(right, bl, bh, "__ov_rc")
        val canonical = EqualTo(lCell, bucketOf(Greatest(Seq(al, bl)), w))
        val rewritten = Join(lG, rG, Inner,
          Some(And(And(EqualTo(lCell, rCell), canonical), cond)), hint)
        Project(left.output ++ right.output, rewritten)
    }
  }
}
