package graft.dsl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {

  private def events = { tables(); spark.table("events") }

  test("approxDistinct tracks exact countDistinct within 3x the declared rsd") {
    val rows = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        Sketches.approxDistinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("approxPercentile at high accuracy matches exact interpolation closely") {
    val r = events.agg(
      Sketches.approxPercentile(col("value"), 0.5).as("ap50"),
      percentile(col("value"), lit(0.5)).as("ep50")).collect()(0)
    val (ap, ep) = (r.getDouble(0), r.getDouble(1))
    // GK sketch returns an actual data value near the true quantile
    assert(math.abs(ap - ep) / math.max(ep.abs, 1e-9) <= 0.05, s"ap=$ap ep=$ep")
  }

  test("group rollups keep sketch aggregation partial (map-side combine)") {
    val df = Sketches.distinctByGroup(events, "event_type", "user_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial"), "sketch aggregation lost map-side partials")
    assert(Sketches.quantilesByGroup(events, "event_type", "value").count() > 0)
  }
}
