package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule that turns no-equi-key range joins into bucketed
  * equi-joins: result-identical to the nested-loop plan, fires only on
  * the sandwich shape and only when the width config is set, and never
  * re-fires on its own output. */
class RangeJoinRewriteSpec extends SparkSpec {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def attachRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite

  private def pts: DataFrame = {
    val sq = spark; import sq.implicits._
    Seq.tabulate(300)(i => (i.toLong, i * 2.5 - 50)).toDF("pid", "p")
  }
  private def ivs: DataFrame = {
    val sq = spark; import sq.implicits._
    Seq((1L, 0.0, 30.0), (2L, -40.0, -20.0), (3L, 100.0, 600.0), (4L, 7.0, 7.0))
      .toDF("iid", "lo", "hi")
  }

  private def joinPlan(strict: Boolean): DataFrame = {
    val cond = if (strict) col("p") > col("lo") && col("p") < col("hi")
               else col("p") >= col("lo") && col("p") <= col("hi")
    pts.join(ivs, cond)
  }

  test("rewrites the sandwich shape to a bucketed equi-join, results identical") {
    attachRule()
    val expected = canon(joinPlan(strict = false).orderBy("pid", "iid"))
    try {
      spark.conf.set(WidthKey, "100.0")
      val q = joinPlan(strict = false)
      q.collect()
      val physical = q.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"range join not rewritten:\n$physical")
      assert(canon(q.orderBy("pid", "iid")) === expected)
      // strict bounds are safe too (bucket span over-approximates)
      val strictExpected = {
        spark.conf.unset(WidthKey)
        canon(joinPlan(strict = true).orderBy("pid", "iid"))
      }
      spark.conf.set(WidthKey, "55.0")
      val s = joinPlan(strict = true)
      s.collect()
      assert(!s.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(canon(s.orderBy("pid", "iid")) === strictExpected)
    } finally spark.conf.unset(WidthKey)
  }

  test("no-ops: config unset, equi conjunct present, non-sandwich condition") {
    attachRule()
    // config unset → BNLJ stays
    val off = joinPlan(strict = false)
    off.collect()
    assert(off.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    try {
      spark.conf.set(WidthKey, "100.0")
      // an equality conjunct means Spark already has a shuffle key — the
      // rule must leave the join alone (JOIN-RANGE's shape)
      val equi = pts.join(ivs,
        col("pid") === col("iid") && col("p") >= col("lo") && col("p") <= col("hi"))
      val equiPlan = equi.queryExecution.optimizedPlan.toString
      assert(!equiPlan.contains("__rj_pb"), s"equi-keyed join was rewritten:\n$equiPlan")
      // one-sided condition (no sandwich) untouched
      val oneSided = pts.join(ivs, col("p") >= col("lo"))
      assert(!oneSided.queryExecution.optimizedPlan.toString.contains("__rj_pb"))
      // and the rewrite is stable: its own output has an equi conjunct,
      // so optimizing twice yields one bucket column pair, not two
      val once = joinPlan(strict = false).queryExecution.optimizedPlan.toString
      assert("__rj_pb".r.findAllIn(once).size >= 1)
      assert(!once.contains("__rj_pb#") || !once.contains("__rj_pb2"))
    } finally spark.conf.unset(WidthKey)
  }
}
