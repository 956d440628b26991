package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Layout

class RollupRouteRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.rollup.route"

  private lazy val dirs: (String, String) = {
    tables()
    val tmp = Files.createTempDirectory("route").toString
    val rawPath = s"$tmp/rawfacts"
    val rollPath = s"$tmp/rollupfacts"
    val raw = spark.table("events").select(
      col("event_type"), col("value"),
      (col("ts").cast("long") - (col("ts").cast("long") % 86400)).as("day"))
    raw.write.partitionBy("day").parquet(rawPath)
    val days = raw.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    Layout.incrementalRollup(spark, rawPath, rollPath,
      "day", Seq("event_type"), "value", days)
    (rawPath, rollPath)
  }

  private def withRoute[T](f: => T): T = {
    val (rawPath, rollPath) = dirs
    if (!spark.experimental.extraOptimizations.contains(RollupRouteRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRouteRewrite
    spark.conf.set(Key, s"$rawPath;$rollPath;day;value;event_type;86400")
    try f finally spark.conf.unset(Key)
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("same-grain aggregate routes to the rollup scan with identical results") {
    val (rawPath, _) = dirs
    val q = () => spark.read.parquet(rawPath)
      .groupBy("event_type", "day")
      .agg(sum("value").as("s"), count(lit(1)).as("c"),
        min("value").as("mn2"), max("value").as("mx2"))
    val expect = q().collect().map(r => (r.getString(0), r.get(1).toString) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    withRoute {
      val routed = q()
      val p = planOf(routed)
      assert(p.contains("rollupfacts"), s"must scan the rollup:\n$p")
      assert(!p.contains("rawfacts"), s"must NOT scan raw:\n$p")
      val got = routed.collect().map(r => (r.getString(0), r.get(1).toString) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(got.keySet === expect.keySet)
      got.foreach { case (k, (s, c, mn, mx)) =>
        val (es, ec, emn, emx) = expect(k)
        assert(c === ec && mn === emn && mx === emx, s"exact stats diverged at $k")
        assert(math.abs(s - es) < 1e-6, s"sum diverged at $k: $s vs $es")
      }
    }
  }

  test("coarser-bucket aggregate (2-day) routes and re-merges correctly") {
    val (rawPath, _) = dirs
    val q = () => spark.read.parquet(rawPath)
      .groupBy(col("event_type"), (col("day") - (col("day") % 172800)).as("b2"))
      .agg(count(lit(1)).as("c"), max("value").as("mx2"))
    val expect = canon(q().orderBy("event_type", "b2"))
    withRoute {
      val routed = q()
      assert(planOf(routed).contains("rollupfacts"))
      assert(canon(routed.orderBy("event_type", "b2")) === expect)
    }
  }

  test("non-derivable shapes keep the raw scan: avg, filters, off-grain buckets") {
    val (rawPath, _) = dirs
    withRoute {
      val avgQ = spark.read.parquet(rawPath)
        .groupBy("event_type").agg(avg("value").as("a"))
      assert(planOf(avgQ).contains("rawfacts"), "avg is not mergeable from sv/c here")
      val filtered = spark.read.parquet(rawPath).where(col("value") > 100)
        .groupBy("event_type").agg(count(lit(1)).as("c"))
      assert(planOf(filtered).contains("rawfacts"), "row filters cannot route")
      val offGrain = spark.read.parquet(rawPath)
        .groupBy((col("day") - (col("day") % 4000)).as("b")).agg(count(lit(1)).as("c"))
      assert(planOf(offGrain).contains("rawfacts"), "4000s is not a day multiple")
    }
  }

  test("rule is inert without the conf") {
    val (rawPath, _) = dirs
    if (!spark.experimental.extraOptimizations.contains(RollupRouteRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRouteRewrite
    val p = planOf(spark.read.parquet(rawPath)
      .groupBy("event_type").agg(sum("value").as("s")))
    assert(p.contains("rawfacts") && !p.contains("rollupfacts"))
  }
}
