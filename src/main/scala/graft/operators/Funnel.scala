package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-step ordered funnel analysis: users who did step 1, then step 2
  * within `windowSec` of that FIRST qualifying step-1 time, then step 3
  * within `windowSec` of THAT first qualifying step-2 time, and so on —
  * order-sensitive, per-user.
  *
  * Plan shape (the 100 TB story): ONE shuffle on the user key. Each step's
  * "first qualifying time" is a conditional running-min stacked on the
  * SAME user-partitioned RANGE-frame sort, so k steps add k window
  * expressions to one WindowExec, not k joins — no theta join, no pair
  * blow-up, and the per-user / summary aggregates reuse the window's hash
  * partitioning. The running min of step i-1 at each row equals the
  * step's global first-qualifying time whenever any qualifying row
  * precedes, which makes this windowed form exactly equal to the
  * decorrelated EXISTS-chain formulation (the EVENT-FUNNEL-K oracle).
  *
  * RANGE frames (not ROWS) so equal-timestamp ties resolve identically in
  * any engine: a step-2 row at exactly the step-1 time qualifies.
  */
object Funnel {

  /** Per-user first qualifying time for each step: (user, t1..tk) with
    * nulls from the first step the user never completed. */
  def stepTimes(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val ep = col(tsCol).cast("double")
    val w = Window.partitionBy(userCol).orderBy(ep)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var df = events
    var prevT: Column = null
    steps.zipWithIndex.foreach { case (st, i) =>
      val qual =
        if (i == 0) when(col(typeCol) === st, ep)
        else when(col(typeCol) === st && prevT.isNotNull &&
          ep <= prevT + windowSec, ep)
      df = df.withColumn(s"__q$i", qual)
      if (i < steps.size - 1) {
        df = df.withColumn(s"__t$i", min(col(s"__q$i")).over(w))
        prevT = col(s"__t$i")
      }
    }
    val aggs = steps.indices.map(i => min(col(s"__q$i")).as(s"t${i + 1}"))
    df.groupBy(col(userCol).as("user"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One-row funnel summary: per-step completing-user counts
    * (n_step1..n_stepk) and adjacent conversion rates (conv12, conv23, …,
    * 4dp, null when the upstream step has zero users). */
  def summary(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    val per = stepTimes(events, userCol, typeCol, tsCol, steps, windowSec)
    val counts = steps.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"n_step${i + 1}"))
    val counted = per.agg(counts.head, counts.tail: _*)
    val convs = steps.indices.drop(1).map { i =>
      val (up, dn) = (col(s"n_step$i"), col(s"n_step${i + 1}"))
      when(up > 0, round(dn.cast("double") / up, 4)).as(s"conv$i${i + 1}")
    }
    counted.select(steps.indices.map(i => col(s"n_step${i + 1}")) ++ convs: _*)
  }
}
