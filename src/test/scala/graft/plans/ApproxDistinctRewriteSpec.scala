package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in approx-mode rule: count(DISTINCT x) → HLL++ when the rsd
  * config is set; Expand-free plans and preserved schemas. */
class ApproxDistinctRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.approx.countDistinct"

  private def attachRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxDistinctRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite

  private def df: DataFrame = {
    val sq = spark; import sq.implicits._
    Seq.tabulate(50000)(i => (i % 5, (i % 9001).toLong, i.toLong))
      .toDF("g", "u", "row")
  }

  test("rewrites grouped and global count-distinct to HLL++ within rsd") {
    attachRule()
    // exact ground truth with the config unset
    val exact = df.groupBy("g").agg(countDistinct(col("u")).as("nd"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    try {
      spark.conf.set(Key, "0.05")
      val q = df.groupBy("g").agg(countDistinct(col("u")).as("nd"))
      val rows = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Expand"), s"distinct Expand survived:\n$plan")
      assert(plan.contains("approx_count_distinct") || plan.contains("hyperloglog"),
        s"HLL++ aggregate missing:\n$plan")
      rows.foreach { case (g, nd) =>
        val ex = exact(g).toDouble
        assert(math.abs(nd - ex) / ex <= 0.15, s"g=$g approx=$nd exact=$ex")
      }
      // schema/alias preserved, result still BIGINT
      assert(q.schema("nd").dataType.typeName === "long")
      // global (ungrouped) form rewrites too
      val g = df.agg(countDistinct(col("u")).as("nd"))
      val nd = g.head().getLong(0)
      assert(math.abs(nd - 9001).toDouble / 9001 <= 0.15, s"global nd=$nd")
      assert(!g.queryExecution.executedPlan.toString.contains("Expand"))
    } finally spark.conf.unset(Key)
  }

  test("no-ops: config unset; multi-arg distinct and FILTER stay correct") {
    attachRule()
    // unset → exact value, plan untouched. The rewrite renders as
    // approx_count_distinct in plan strings (never "hyperloglog") — the
    // negative probes must grep the marker that actually appears, or they
    // pass vacuously.
    val off = df.agg(countDistinct(col("u")).as("nd"))
    assert(off.head().getLong(0) === 9001L)
    assert(!off.queryExecution.optimizedPlan.toString
      .contains("approx_count_distinct"))
    try {
      spark.conf.set(Key, "0.05")
      // multi-arg count(DISTINCT a, b) counts tuples — left exact
      val multi = df.agg(countDistinct(col("g"), col("u")).as("nd"))
      val multiPlan = multi.queryExecution.optimizedPlan.toString
      assert(!multiPlan.contains("approx_count_distinct"),
        s"multi-arg distinct must stay exact:\n$multiPlan")
      assert(multi.head().getLong(0) === df.select("g", "u").distinct().count())
      // FILTER clause rides along on the rewritten aggregate
      val filtered = df.agg(
        count_distinct(col("u")).as("all_nd"),
        expr("count(DISTINCT u) FILTER (WHERE g = 0)").as("g0_nd"))
      val r = filtered.head()
      val exactG0 = df.where(col("g") === 0).select("u").distinct().count()
      assert(math.abs(r.getLong(1) - exactG0).toDouble / exactG0 <= 0.15,
        s"filtered nd=${r.getLong(1)} exact=$exactG0")
    } finally spark.conf.unset(Key)
  }
}
