package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Datapoint rewrite middleware — the proxy's optional in-flight mutations
  * between listener and forwarder (metricproxy config: listener-level
  * `dimensions` added to every point, forwarder-level metric allow/deny
  * filters, name rewriting [P]).
  *
  * All three are narrow, codegen'd per-row transforms (map/regex
  * expressions) — no shuffle, no state; they compose with any
  * listener/forwarder pair and cost one scan at any volume.
  */
object Rewrite {

  /** Add static dimensions to every datapoint. Existing per-point
    * dimensions WIN on key collision (the listener's config decorates,
    * it never clobbers what the sender set). A NULL dimensions map is
    * decorated too — it becomes exactly the static map (map_concat would
    * otherwise null-propagate and silently drop the decoration). */
  def addDimensions(points: DataFrame, dims: Map[String, String],
                    dimsCol: String = "dimensions"): DataFrame = {
    if (dims.isEmpty) points
    else {
      val static: Column = map(dims.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      points.withColumn(dimsCol,
        when(col(dimsCol).isNull, static)
          .otherwise(map_concat(col(dimsCol),
            map_filter(static, (k, _) => !map_contains_key(col(dimsCol), k)))))
    }
  }

  /** Keep only datapoints whose metric matches `allow` (if set) and does
    * not match `deny` (if set) — the forwarder filter pair. Anchoring is
    * the caller's job (patterns are `rlike`, i.e. find-anywhere). */
  def filterMetrics(points: DataFrame, allow: Option[String] = None,
                    deny: Option[String] = None,
                    metricCol: String = "metric"): DataFrame = {
    val allowed = allow.map(col(metricCol).rlike(_)).getOrElse(lit(true))
    val denied = deny.map(col(metricCol).rlike(_)).getOrElse(lit(false))
    points.filter(allowed && !denied)
  }

  /** Regex-rewrite the metric name (all occurrences). */
  def renameMetric(points: DataFrame, pattern: String, replacement: String,
                   metricCol: String = "metric"): DataFrame =
    points.withColumn(metricCol, regexp_replace(col(metricCol), pattern, replacement))
}
