package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Layout
import graft.plans.RollupRouteRewrite

/** The full OLAP maintenance loop, end to end: streaming ingest appends
  * raw day-partitioned parquet, `foreachBatch` incrementally re-rolls
  * ONLY the partitions the batch touched, and `RollupRouteRewrite`
  * transparently serves dashboard aggregates from the rollup — the
  * "lambda-less" architecture where one streaming job keeps the
  * materialized view fresh and queries never change. Asserts the routed
  * plan scans only the rollup AND matches the raw recompute exactly after
  * every batch, including a late-arriving batch that rewrites an OLD
  * day's partition. */
final case class S2rDp(event_type: String, value: Double, day: Long)

class StreamToRollupSpec extends SparkSpec {

  test("streaming foreachBatch maintains the rollup; routed dashboards stay exact") {
    val sq = spark
    import sq.implicits._
    val root = Files.createTempDirectory("s2r").toString
    val rawPath = s"$root/raw"
    val rollPath = s"$root/rollup"

    val input = MemoryStream[S2rDp](spark)
    val query = input.toDS().writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[S2rDp], _: Long) =>
        val b = batch.persist()
        try {
          b.toDF().write.mode("append").partitionBy("day").parquet(rawPath)
          val touched = b.select(col("day").cast("string")).distinct()
            .collect().map(_.getString(0)).toSeq
          if (touched.nonEmpty)
            Layout.incrementalRollup(spark, rawPath, rollPath,
              "day", Seq("event_type"), "value", touched)
        } finally b.unpersist()
        ()
      }
      .start()

    def dash() = spark.read.parquet(rawPath)
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), avg("value").as("a"),
        max("value").as("mx"))
      .orderBy("event_type", "day")

    val day0 = 0L
    val day1 = 86400L
    input.addData((1 to 200).map(i =>
      S2rDp(if (i % 2 == 0) "click" else "view", i * 0.5, if (i % 3 == 0) day1 else day0)))
    query.processAllAvailable()

    if (!spark.experimental.extraOptimizations.contains(RollupRouteRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRouteRewrite
    spark.conf.set("spark.graft.rollup.route",
      s"$rawPath;$rollPath;day;value;event_type;86400")
    try {
      def check(): Unit = {
        val routed = dash()
        val p = routed.queryExecution.executedPlan.toString
        assert(p.contains("rollup") && !p.contains("/raw"),
          s"dashboard must be served from the rollup:\n$p")
        val got = canon(routed)
        // ground truth from the raw files with the rule DISABLED
        spark.conf.unset("spark.graft.rollup.route")
        val expect = canon(dash())
        spark.conf.set("spark.graft.rollup.route",
          s"$rawPath;$rollPath;day;value;event_type;86400")
        assert(got === expect, "routed dashboard diverged from raw recompute")
      }
      check()

      // a second batch, including LATE data for day0: the rollup rewrite
      // must repair the OLD partition, not just append the new one
      input.addData((1 to 100).map(i =>
        S2rDp("click", 1000.0 + i, if (i % 4 == 0) day0 else day1)))
      query.processAllAvailable()
      check()
    } finally {
      spark.conf.unset("spark.graft.rollup.route")
      query.stop()
    }
  }
}
