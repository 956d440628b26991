package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The opt-in approx-mode percentile rule: percentile()/median() → GK
  * approx_percentile when the accuracy config is set; preserved schemas,
  * rank-error-bounded values, and untouched weighted/off cases. */
class ApproxPercentileRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.approx.percentile"

  private def attachRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(ApproxPercentileRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxPercentileRewrite

  // 50k rows, values 0..9999 uniform per group: exact p50 ≈ 5000
  private def df: DataFrame = {
    val sq = spark; import sq.implicits._
    Seq.tabulate(50000)(i => (i % 5, (i % 10000).toDouble)).toDF("g", "v")
  }

  test("rewrites percentile and median to the GK sketch within rank error") {
    attachRule()
    try {
      spark.conf.set(Key, "10000")
      val q = df.groupBy("g").agg(
        expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, array(0.1, 0.9))").as("deciles"),
        expr("median(v)").as("med"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx") || plan.contains("approx_percentile"),
        s"GK aggregate missing:\n$plan")
      assert(!plan.toLowerCase.contains("percentile("),
        s"exact percentile survived the rewrite:\n$plan")
      val r = q.collect()
      r.foreach { row =>
        // error <= N/accuracy ranks = 5 ranks of 10k values ≈ ±5 in value
        assert(math.abs(row.getDouble(1) - 5000.0) <= 50.0, s"p50=${row.getDouble(1)}")
        val ds = row.getSeq[Double](2)
        assert(math.abs(ds.head - 1000.0) <= 50.0 && math.abs(ds(1) - 9000.0) <= 50.0)
        assert(math.abs(row.getDouble(3) - 5000.0) <= 50.0, s"med=${row.getDouble(3)}")
      }
      // schema preserved: scalar DOUBLE, array percentage ARRAY<DOUBLE>
      assert(q.schema("p50").dataType.typeName === "double")
      assert(q.schema("deciles").dataType.typeName === "array")
    } finally spark.conf.unset(Key)
  }

  test("no-ops: config unset stays exact; weighted percentile never rewrites") {
    attachRule()
    val off = df.agg(expr("percentile(v, 0.5)").as("p50"))
    assert(!off.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
    assert(off.head().getDouble(0) === 4999.5) // exact interpolated median
    try {
      spark.conf.set(Key, "10000")
      // 3-arg frequency form has no sketch equivalent — must stay exact
      val w = df.agg(expr("percentile(v, 0.5, 2)").as("p50"))
      assert(!w.queryExecution.optimizedPlan.toString.contains("percentile_approx"),
        "weighted percentile must not rewrite")
      assert(w.head().getDouble(0) === 4999.5)
      // FILTER clause rides through the rewrite unchanged
      val f = df.agg(expr("percentile(v, 0.5) FILTER (WHERE v < 1000)").as("p"))
      assert(f.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(math.abs(f.head().getDouble(0) - 499.5) <= 10.0)
    } finally spark.conf.unset(Key)
  }
}
