package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Scale probe for the materialized-rollup routing rule: a daily dashboard
  * aggregate over N raw rows vs the same SQL transparently served from the
  * incrementalRollup table. Usage: Test/runMain graft.plans.RollupRouteProbe
  * [rows] — default 20M. */
object RollupRouteProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RollupRouteRewrite

    val tmp = Files.createTempDirectory("routeprobe").toString
    val rawPath = s"$tmp/rawfacts"
    val rollPath = s"$tmp/rollupfacts"
    spark.range(rows).select(
        concat(lit("m"), (col("id") % 5).cast("string")).as("event_type"),
        (col("id") % 997).cast("double").as("value"),
        ((col("id") % (30L * 86400)) - ((col("id") % (30L * 86400)) % 86400)).as("day"))
      .write.partitionBy("day").parquet(rawPath)
    val days = spark.read.parquet(rawPath).select(col("day").cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq
    val t0 = System.nanoTime()
    Layout.incrementalRollup(spark, rawPath, rollPath,
      "day", Seq("event_type"), "value", days)
    val buildS = (System.nanoTime() - t0) / 1e9

    def q() = spark.read.parquet(rawPath)
      .groupBy("event_type", "day")
      .agg(sum("value").as("s"), count(lit(1)).as("c"), max("value").as("mx"))
    def time(f: => Unit): Double = {
      val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9
    }
    q().collect(); val rawS = math.min(time(q().collect()), time(q().collect()))
    spark.conf.set("spark.graft.rollup.route",
      s"$rawPath;$rollPath;day;value;event_type;86400")
    val routedPlan = q().queryExecution.executedPlan.toString
    assert(routedPlan.contains("rollupfacts"), "probe query did not route")
    q().collect()
    val routedS = math.min(time(q().collect()), time(q().collect()))
    println(f"[route-probe] rows=$rows rollup_build=${buildS}%.2fs " +
      f"raw_agg=${rawS}%.2fs routed_agg=${routedS}%.2fs speedup=${rawS / routedS}%.1fx")
    spark.stop()
  }
}
