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

  test("avg routes as sum(sv)/sum(c)") {
    val (rawPath, _) = dirs
    val q = () => spark.read.parquet(rawPath)
      .groupBy("event_type").agg(avg("value").as("a"))
    val expect = q().collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    withRoute {
      val routed = q()
      assert(planOf(routed).contains("rollupfacts"), planOf(routed))
      val got = routed.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet === expect.keySet)
      got.foreach { case (k, a) => assert(math.abs(a - expect(k)) < 1e-9) }
    }
  }

  test("avg and count(value) stay exact when the value column has nulls") {
    // avg divides by the NON-NULL count; the rollup's `c` counts rows, so
    // routing must use the `cnn` column — with ~1/3 of values nulled, a
    // c-based route would be visibly wrong
    tables()
    val tmp = Files.createTempDirectory("routenull").toString
    val rawPath = s"$tmp/rawnull"
    val rollPath = s"$tmp/rollnull"
    val raw = spark.table("events").select(
      col("event_type"),
      when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value"))
        .as("value"),
      (col("ts").cast("long") - (col("ts").cast("long") % 86400)).as("day"))
    raw.write.partitionBy("day").parquet(rawPath)
    val days = raw.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    Layout.incrementalRollup(spark, rawPath, rollPath,
      "day", Seq("event_type"), "value", days)
    val q = () => spark.read.parquet(rawPath)
      .groupBy("event_type")
      .agg(avg("value").as("a"), count(col("value")).as("cv"),
        count(lit(1)).as("cr"))
    val expect = q().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    if (!spark.experimental.extraOptimizations.contains(RollupRouteRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRouteRewrite
    spark.conf.set(Key, s"$rawPath;$rollPath;day;value;event_type;86400")
    try {
      val routed = q()
      val p = planOf(routed)
      assert(p.contains("rollnull") && !p.contains("rawnull"),
        s"nullable avg must still route (via cnn):\n$p")
      val got = routed.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
      assert(got.keySet === expect.keySet)
      got.foreach { case (k, (a, cv, cr)) =>
        val (ea, ecv, ecr) = expect(k)
        assert(cv === ecv, s"non-null count diverged at $k")
        assert(cr === ecr, s"row count diverged at $k")
        assert(math.abs(a - ea) < 1e-9, s"avg diverged at $k: $a vs $ea")
      }
    } finally spark.conf.unset(Key)
  }

  test("dimension/time filters route; value filters do not") {
    val (rawPath, _) = dirs
    val cutoff = spark.read.parquet(rawPath).agg(max("day")).collect()(0).get(0).toString.toLong
    val timeQ = () => spark.read.parquet(rawPath)
      .where(col("day") >= cutoff - 3 * 86400 && col("event_type") =!= "view")
      .groupBy("event_type").agg(count(lit(1)).as("c"), sum("value").as("s"))
    val expect = canon(timeQ().orderBy("event_type"))
    withRoute {
      val routed = timeQ()
      val p = planOf(routed)
      assert(p.contains("rollupfacts") && !p.contains("rawfacts"),
        s"the dashboard time-range shape must route:\n$p")
      assert(canon(routed.orderBy("event_type")) === expect)
      val valueFiltered = spark.read.parquet(rawPath).where(col("value") > 100)
        .groupBy("event_type").agg(count(lit(1)).as("c"))
      assert(planOf(valueFiltered).contains("rawfacts"), "row filters cannot route")
    }
  }

  test("non-derivable shapes keep the raw scan: stddev, off-grain buckets") {
    val (rawPath, _) = dirs
    withRoute {
      val sdQ = spark.read.parquet(rawPath)
        .groupBy("event_type").agg(stddev("value").as("sd"))
      assert(planOf(sdQ).contains("rawfacts"), "stddev is not mergeable from sv/c")
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
