package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the engine's one custom PHYSICAL operator,
  * completing the extension ladder: codegen `Expression`s (graft_cosine …),
  * `TypedImperativeAggregate`s (topk/theta/KLL), optimizer `Rule`s (the
  * five rewrites), and now a `LogicalPlan` + `Strategy` + `SparkPlan`.
  *
  * For each right row: the greatest left `ts <= right.ts` on the same key.
  * The composed operator (`operators.AsOfJoin.lastBefore`) does this as
  * union + running window — one shuffle, one sort over |L|+|R| rows, then
  * a filter that throws the left rows away. This exec declares the SAME
  * distribution + ordering requirements a SortMergeJoin would
  * (ClusteredDistribution on the key, (key, ts) sort per side) and then
  * MERGES the two sorted streams per partition in one O(|L|+|R|) pass with
  * O(1) state (current key + last left ts): no unioned row set, no window
  * buffering, left rows never materialize into the output pipeline.
  * Catalyst still owns planning: EnsureRequirements inserts/elides the
  * exchanges and sorts, so bucketed or pre-sorted children join with NO
  * extra shuffle — exactly like a merge join.
  *
  * Keys and timestamps are read as longs (ids; TimestampType is
  * micros-as-long internally) — the API layer casts and null-filters. */
final case class MergeAsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    tsOut: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = right.output :+ tsOut
  override def producedAttributes: AttributeSet = AttributeSet(tsOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): MergeAsOfJoin =
    copy(left = newLeft, right = newRight)
}

object MergeAsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: MergeAsOfJoin =>
      MergeAsOfJoinExec(j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.tsOut,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

final case class MergeAsOfJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    tsOut: AttributeReference,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = right.output :+ tsOut
  override def producedAttributes: AttributeSet = AttributeSet(tsOut)

  // the SortMergeJoin contract: co-partition on the keys, sort (key, ts).
  // EnsureRequirements satisfies these with exchanges/sorts only where the
  // children don't already provide them (bucketed tables join shuffle-free)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputPartitioning: Partitioning = right.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = right.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lki = left.output.indexOf(leftKey)
    val lti = left.output.indexOf(leftTs)
    val rki = right.output.indexOf(rightKey)
    val rti = right.output.indexOf(rightTs)
    val outAttrs = output
    val rightAttrs = right.output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outAttrs, rightAttrs :+ tsOut)
      val extra = new GenericInternalRow(1)
      val joined = new JoinedRow
      // one-row lookahead over the sorted left stream; O(1) merge state
      var lValid = false
      var lKey = 0L
      var lTs = 0L
      def advanceLeft(): Unit =
        if (lIt.hasNext) {
          val r = lIt.next()
          if (r.isNullAt(lki) || r.isNullAt(lti)) advanceLeft()
          else { lKey = r.getLong(lki); lTs = r.getLong(lti); lValid = true }
        } else lValid = false
      advanceLeft()
      var haveLast = false
      var lastKey = 0L
      var lastTs = 0L
      rIt.map { rRow =>
        if (rRow.isNullAt(rki) || rRow.isNullAt(rti)) {
          extra.setNullAt(0)
          proj(joined(rRow, extra))
        } else {
        val rk = rRow.getLong(rki)
        val rt = rRow.getLong(rti)
        // consume left rows at or before (rk, rt); right is (key, ts)-
        // sorted too, so no consumed row is ever needed again
        while (lValid && (lKey < rk || (lKey == rk && lTs <= rt))) {
          lastKey = lKey; lastTs = lTs; haveLast = true
          advanceLeft()
        }
        if (haveLast && lastKey == rk) extra.setLong(0, lastTs)
        else extra.setNullAt(0)
        proj(joined(rRow, extra))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): MergeAsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
