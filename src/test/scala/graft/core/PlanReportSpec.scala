package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PlanReportSpec extends SparkSpec {

  test("counts joins, shuffles, scans, pushdown on a star-join aggregate") {
    tables()
    val q = spark.table("lineitem")
      .where(col("l_quantity") > 10)
      .join(spark.table("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(spark.table("customer")), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    val r = PlanReport.of(q)
    assert(r.fileScans === 3)
    assert(r.scansWithPushedFilters >= 1, r.render)
    assert(r.pushedFilters.exists(_.contains("l_quantity")), r.pushedFilters)
    assert(r.broadcastHashJoins >= 1, r.render)
    assert(r.nestedLoopJoins === 0 && r.cartesianProducts === 0)
    assert(r.shuffleExchanges >= 1, "groupBy + SMJ must shuffle")
    assert(r.wholeStageCodegenSpans >= 1)
    assert(r.flags.isEmpty, r.flags)
  }

  test("flags the scale-killers: cartesian and unpartitioned window") {
    val sq = spark; import sq.implicits._
    val a = (1 to 50).toDF("x")
    val b = (1 to 40).toDF("y")
    val cart = PlanReport.of(a.crossJoin(b))
    assert(cart.cartesianProducts + cart.nestedLoopJoins >= 1, cart.render)
    assert(cart.flags.nonEmpty)

    val w = org.apache.spark.sql.expressions.Window.orderBy("x")
    val gw = PlanReport.of(a.withColumn("rn", row_number().over(w)))
    assert(gw.unpartitionedWindows === 1, gw.render)
    assert(gw.flags.exists(_.contains("unpartitioned")), gw.flags)
    // a PARTITIONED window is clean
    val pw = PlanReport.of(
      (1 to 50).map(i => (i % 5, i)).toDF("g", "x").withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("x"))))
    assert(pw.unpartitionedWindows === 0, pw.render)
  }

  test("reports through AQE's final plan and counts global sorts") {
    tables()
    // a full ORDER BY (no limit — any limit plans as TakeOrderedAndProject)
    // is a global range-partitioned sort
    val q = spark.table("orders").orderBy("o_totalprice")
    val r = PlanReport.of(q)
    assert(r.globalSorts >= 1, r.render)
    // the bucketed zero-Exchange join reports zero shuffles
    val sfx = graft.operators.Layout.dirSuffix(sfDir)
    graft.queries.Extensions.queries("JOIN-BUCKETED")(spark, sfDir).collect()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.table(s"graft_bkt_li_$sfx")
      val ord = spark.table(s"graft_bkt_ord_$sfx")
      val jr = PlanReport.of(li.join(ord, li("l_orderkey") === ord("o_orderkey")))
      assert(jr.shuffleExchanges === 0, jr.render)
      assert(jr.sortMergeJoins === 1, jr.render)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
