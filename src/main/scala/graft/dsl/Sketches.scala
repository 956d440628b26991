package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the 100 TB path for the shapes the
  * exact inventory twins (AGG-DISTINCT, AGG-MEDIAN) cannot survive at
  * scale.
  *
  * Exact `count(DISTINCT)` expands + double-shuffles; exact `percentile`
  * buffers every value per group. Both are fine at fixture scale and
  * unusable on 10¹² rows. The sketches below are one-pass, mergeable,
  * bounded-memory (HLL++ registers / GK quantile summaries), so partial
  * aggregation and map-side combine apply — the shuffle carries
  * kilobyte-size sketches, not data.
  *
  * Deliberately NOT in the oracle hash contract: sketch contents are not
  * bit-stable across engines (SURVEY.md §2b). Tests assert error bounds
  * against the exact twins instead.
  */
object Sketches {

  /** HLL++ distinct count, default 2% relative standard deviation. */
  def approxDistinct(e: Column, rsd: Double = 0.02): Column =
    approx_count_distinct(e, rsd)

  /** Mergeable quantile sketch: approximate percentiles at the given
    * accuracy (1/accuracy relative rank error; 10000 → 0.01%). */
  def approxPercentile(e: Column, percentage: Double, accuracy: Int = 10000): Column =
    percentile_approx(e, lit(percentage), lit(accuracy))

  /** Per-group distinct-user style rollup: (group, approx_users). */
  def distinctByGroup(df: DataFrame, groupCol: String, idCol: String,
                      rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCol)
      .agg(approxDistinct(col(idCol), rsd).as(s"approx_$idCol"))

  /** Per-group quantile rollup: (group, p50, p90, p99). */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol).agg(
      approxPercentile(col(valueCol), 0.5, accuracy).as("p50"),
      approxPercentile(col(valueCol), 0.9, accuracy).as("p90"),
      approxPercentile(col(valueCol), 0.99, accuracy).as("p99"))
}
