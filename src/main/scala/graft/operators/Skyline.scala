package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated on
  * (minimize `minCol`, maximize `maxCol`).
  *
  * Never the quadratic dominance self-join. The skyline is distributive —
  * a point dominated inside any subset is dominated globally — so the plan
  * is the classic two-phase shape:
  *
  *  1. per-partition prune: sort each partition by (min asc, max desc) and
  *     drop rows strictly below the partition's running max — a map-side
  *     pass with no shuffle that cuts each partition to ≈ its local
  *     frontier (for random order, O(log n) expected survivors);
  *  2. global pass on the surviving sliver: distinct (min, max) pairs,
  *     per-`minCol` group max, then one sorted running-max window — the
  *     frontier is exactly the pairs whose max exceeds every strictly-lower
  *     min's best.
  *
  * At 100 TB phase 1 runs where the data sits; only frontier candidates
  * (typically thousands) reach the single-task global window.
  */
object Skyline {

  /** Local dominance prune: keep rows no other row IN THE SAME PARTITION
    * strictly dominates. Exact superset of the global frontier under any
    * partitioning. */
  private def localPrune(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val w = Window.partitionBy(spark_partition_id())
      .orderBy(col(minCol).asc, col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // a preceding row in this sort has min <= current (and max >= current at
    // equal min), so running max(maxCol) > current max ⇒ strictly dominated
    df.withColumn("__mx", max(col(maxCol)).over(w))
      .where(col("__mx").isNull || col("__mx") <= col(maxCol))
      .drop("__mx")
  }

  /** The frontier as distinct `(minCol, maxCol)` pairs. */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val pruned = localPrune(df.select(minCol, maxCol), minCol, maxCol)
    val g = pruned.distinct()
      .groupBy(minCol).agg(max(col(maxCol)).as(maxCol))
    // the candidate set is frontier-sized; the unpartitioned window is fine
    val w = Window.orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("__lt", max(col(maxCol)).over(w))
      .where(col("__lt").isNull || col("__lt") < col(maxCol))
      .drop("__lt")
  }
}
