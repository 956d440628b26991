package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketch operators — the first tools a user reaches for at
  * 100 TB, where exact `count(DISTINCT ...)` means a full shuffle of every
  * key and exact medians mean a global sort.
  *
  * All of these are Spark-native sketch aggregates (HLL++ for
  * approx_count_distinct, Apache DataSketches HLL for the mergeable
  * sketch column, Greenwald-Khanna summaries for percentile_approx):
  * map-side partial aggregation, fixed-size buffers, one narrow shuffle of
  * sketch bytes instead of raw keys. The mergeable variants are the
  * re-aggregation pattern: sketch once per fine-grained group (per day,
  * per shard), roll up to any coarser grouping later WITHOUT rescanning
  * the data.
  *
  * Estimates are deterministic for a given input (sketches are hashed, not
  * sampled), so error-bound assertions on fixed data are stable — see
  * AGG-APPROX-DISTINCT / AGG-APPROX-MEDIAN and SketchesSpec.
  */
object Sketches {

  /** Per-group approximate distinct count of `valueCol` (HLL++). `rsd` is
    * the target relative standard deviation (default 5%). */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_nd"))

  /** Per-group MERGEABLE HLL sketch of `valueCol` (DataSketches, binary
    * column). lgK = log2 of the register count: 12 → 4 KiB per group,
    * ~1.6% relative error. */
  def hllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll sketches up to a coarser grouping without touching the raw data —
    * e.g. per-(day, shard) sketches to per-day totals. The merge shuffles
    * only sketch bytes (4 KiB per input group at lgK=12). */
  def hllRollup(sketches: DataFrame, coarserCols: Seq[String],
                sketchCol: String = "hll",
                allowDifferentLgK: Boolean = false): DataFrame =
    sketches.groupBy(coarserCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol), lit(allowDifferentLgK)).as(sketchCol))

  /** Distinct-count estimate from a sketch column. */
  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Per-group approximate median (Greenwald-Khanna; rank error bounded by
    * group_size / accuracy). Returns an actual data value, no
    * interpolation. */
  def approxMedian(df: DataFrame, groupCol: String, valueCol: String,
                   accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("approx_median"))

  /** Per-group approximate quantile vector. */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol),
        array(probs.map(lit): _*), lit(accuracy)).as("approx_q"))

  /** Per-group MERGEABLE quantile sketches (KLL, Karnin-Lang-Liberty
    * FOCS'16): unlike GK percentiles, KLL sketches union losslessly — so
    * build per-(fine-grain, shard) sketches once and re-aggregate coarser
    * with [[kllRollup]] WITHOUT rescanning the raw data, the same contract
    * as the HLL distinct column. Rank error ≈ 1.65 % at k=200 (99 %). */
  def kllSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                k: Int = 200): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_kll_agg", col(valueCol).cast("double"), lit(k))
        .as("kll"))
  }

  /** Union fine-grain KLL sketches to a coarser grouping — quantiles over
    * any rollup of the grain, no raw-data rescan. */
  def kllRollup(sketches: DataFrame, coarserCols: Seq[String],
                sketchCol: String = "kll", k: Int = 200): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(sketches.sparkSession)
    sketches.groupBy(coarserCols.map(col): _*)
      .agg(call_function("graft_kll_merge", col(sketchCol), lit(k)).as(sketchCol))
  }

  /** Quantile readout from a KLL sketch column (inclusive rank). */
  def kllQuantile(sketch: Column, q: Double): Column =
    call_function("graft_kll_quantile", sketch, lit(q))

  /** Inverse readout: estimated normalized rank of a value — the
    * fraction of the sketched distribution <= x (inclusive). */
  def kllRank(sketch: Column, x: Column): Column =
    call_function("graft_kll_rank", sketch, x.cast("double"))

  /** Per-group MERGEABLE theta sketches: distinct-count summaries CLOSED
    * UNDER SET ALGEBRA — unlike HLL, theta sketches intersect and
    * subtract, so segment-overlap questions ("users who did A and B",
    * "did A but not B") are answered from the sketch column without
    * re-scanning or semi-joining the raw data. lgK = log2 nominal
    * entries: 12 → ≤4096 retained hashes, ~1.6 % relative error once
    * estimating (exact below the nominal count). */
  def thetaSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  lgK: Int = 12): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_theta_agg", col(valueCol), lit(lgK)).as("theta"))
  }

  /** Union fine-grain theta sketches to a coarser grouping. */
  def thetaRollup(sketches: DataFrame, coarserCols: Seq[String],
                  sketchCol: String = "theta", lgK: Int = 12): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(sketches.sparkSession)
    sketches.groupBy(coarserCols.map(col): _*)
      .agg(call_function("graft_theta_union", col(sketchCol), lit(lgK)).as(sketchCol))
  }

  /** Distinct-count estimate from a theta sketch column. */
  def thetaEstimate(sketch: Column): Column =
    call_function("graft_theta_estimate", sketch)

  /** Intersection sketch of two sketch columns (composable: feed the
    * result back into [[thetaEstimate]] or another set op). */
  def thetaIntersect(a: Column, b: Column): Column =
    call_function("graft_theta_intersect", a, b)

  /** A-and-not-B sketch of two sketch columns. */
  def thetaANotB(a: Column, b: Column): Column =
    call_function("graft_theta_anotb", a, b)

  /** Pairwise union sketch of two sketch columns (row-level; use
    * [[thetaRollup]] to union down a column). */
  def thetaUnionPair(a: Column, b: Column): Column =
    call_function("graft_theta_union_pair", a, b)

  /** Per-group frequent items (heavy hitters): Misra-Gries sketch with at
    * most `k` counters, returned as map<string,bigint> of item → estimated
    * count ([[graft.functions.expressions.FreqItemsAgg]]). Guarantees:
    * estimates never overstate, undercount ≤ n/(k+1), and every item with
    * true count > n/(k+1) is present. Map-side partial aggregation ships
    * ≤ k entries per partition instead of the raw key stream — the scale
    * twin of the exact AGG-TOPK-FREQ query. */
  def frequentItems(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    k: Int = 64): DataFrame = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    df.groupBy(groupCols.map(col): _*)
      .agg(call_function("graft_freq_items",
        col(valueCol).cast("string"), lit(k)).as("freq"))
  }
}
