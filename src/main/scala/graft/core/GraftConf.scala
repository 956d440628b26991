package graft.core

import org.apache.spark.sql.SparkSession

/** One-call configuration profiles for the engine's opt-in optimizer
  * rewrites.
  *
  * Every rewrite rule in `graft.plans` is a NO-OP until its conf key is
  * set — correct-by-default, but it means a naive user never discovers
  * that the contract-shape SQL they run (theta-join as-of, unpartitioned
  * windows, exact COUNT(DISTINCT) dashboards, band joins) has a
  * partitioned/bounded-memory twin one config away. [[scaleDefaults]] is
  * the documented "scale profile": it registers the rule set on the
  * session (idempotent — no-op when the session was built with
  * `spark.sql.extensions=graft.functions.expressions.GraftSparkExtensions`)
  * and flips the recommended values in one call.
  *
  * What it deliberately does NOT set:
  *  - `spark.graft.rollup.route` — needs a rollup table YOU maintain
  *    (`Layout.incrementalRollup`); there is no safe default.
  *  - the approx rewrites, unless `approx = true`: HLL++ count-distinct
  *    and GK percentiles CHANGE RESULTS (bounded error for bounded
  *    memory). That trade must be explicit, so exact-by-default.
  */
object GraftConf {

  /** The recommended scale settings, overridable per field.
    *
    * @param rangeJoinBucketWidth grid width for band/interval-overlap
    *   joins, in the JOIN COLUMN'S OWN UNITS — the default 3600 suits
    *   epoch-second timestamps with hour-scale bands; set ≈ the typical
    *   band span for other domains (the rule caps blow-up at
    *   `maxBucketsPerInterval` and fails fast with the conf named).
    * @param approx also flip the result-changing approximations:
    *   COUNT(DISTINCT)→HLL++ at `rsd`, percentile/median→GK at
    *   `percentileAccuracy`. */
  final case class ScaleProfile(
      rangeJoinBucketWidth: Double = 3600.0,
      maxBucketsPerInterval: Long = 4096L,
      asofRewrite: Boolean = true,
      globalWindowRewrite: Boolean = true,
      approx: Boolean = false,
      rsd: Double = 0.01,
      percentileAccuracy: Int = 10000)

  private val rules = Seq(
    graft.plans.RangeJoinRewrite,
    graft.plans.ApproxDistinctRewrite,
    graft.plans.AsOfJoinRewrite,
    graft.plans.ApproxPercentileRewrite,
    graft.plans.GlobalWindowRewrite,
    graft.plans.RollupRouteRewrite,
    graft.plans.IntervalOverlapRewrite)

  /** Register the rewrite rules on `spark` (idempotent). Sessions built
    * with the `GraftSparkExtensions` entry point already have them. */
  def registerRules(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val missing = rules.filterNot(r => cur.exists(_ eq r))
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
  }

  /** Apply the scale profile: register the rules and set the conf keys.
    * Returns the key→value map that was set (log it at deploy time). */
  def scaleDefaults(spark: SparkSession,
                    p: ScaleProfile = ScaleProfile()): Map[String, String] = {
    registerRules(spark)
    graft.functions.expressions.GraftFunctions.register(spark)
    val kv = Map(
      "spark.graft.rangeJoin.bucketWidth" -> p.rangeJoinBucketWidth.toString,
      "spark.graft.rangeJoin.maxBucketsPerInterval" -> p.maxBucketsPerInterval.toString,
      "spark.graft.asofJoin.rewrite" -> p.asofRewrite.toString,
      "spark.graft.rewrite.globalWindow" -> p.globalWindowRewrite.toString) ++
      (if (p.approx) Map(
        "spark.graft.approx.countDistinct" -> p.rsd.toString,
        "spark.graft.approx.percentile" -> p.percentileAccuracy.toString)
       else Map.empty)
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    kv
  }

  /** Unset every graft rewrite key (the rules revert to no-ops; they stay
    * registered — an inert rule costs one pattern-match per plan). */
  def reset(spark: SparkSession): Unit =
    Seq("spark.graft.rangeJoin.bucketWidth",
      "spark.graft.rangeJoin.maxBucketsPerInterval",
      "spark.graft.asofJoin.rewrite",
      "spark.graft.rewrite.globalWindow",
      "spark.graft.approx.countDistinct",
      "spark.graft.approx.percentile",
      "spark.graft.rollup.route").foreach(spark.conf.unset)
}
