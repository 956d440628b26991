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

  test("sweep: every declared query is flag-free outside the known-benign allowlist") {
    // The allowlist is NOT an excuse list — each entry is a SHAPE the
    // engine chose deliberately:
    //  - 1-ROW STAT BROADCASTS: crossJoin(broadcast(1-row aggregate))
    //    plans as BroadcastNestedLoopJoin — the standard scalar-broadcast
    //    pattern (corpus totals, probe vectors, grid bounds); "nested
    //    loop" over one row is a map-side lookup, not a pair blow-up.
    //  - CONTRACT SINGLE-PARTITION WINDOWS: WIN-LAG-LEAD/FRAME-RANGE/
    //    NTILE are the contract shapes whose -SCALE twins exist precisely
    //    because of this flag; the twins' own unpartitioned windows run
    //    over METADATA-SCALE reduced input (PlanAuditSpec asserts that).
    //  - JOIN-CROSS: a 25x1 cartesian by definition.
    // Anything NEWLY flagged means a query degenerated — fail loudly.
    tables()
    val allow: Map[String, String] = Map(
      "AGG-SKYLINE" -> "frontier-sized global window (post local prune)",
      "AGG-THETA-SETOPS" -> "1-row sketch frames crossed",
      "AGG-TPCH-Q11" -> "1-row scalar threshold broadcast",
      "DQ-SKEW" -> "1-row totals broadcast",
      "EVENT-ABTEST" -> "1-row per-variant frames crossed",
      "EVENT-CONCURRENCY" -> "contract shape; -SCALE twin exists",
      "EVENT-CONCURRENCY-SCALE" -> "block-offset window over bucket summaries",
      "EVENT-FUNNEL" -> "1-row step-count broadcast",
      "EVENT-RFM" -> "1-row reference-date broadcast",
      "EVENT-STICKINESS" -> "7-day band join, day-grid sized",
      "JOIN-CROSS" -> "cartesian by definition (25x1)",
      "JOIN-TPCH-Q22" -> "1-row avg-balance scalar broadcast",
      "LLM-ANN-PROBES" -> "probe-vector set broadcast",
      "LLM-COSINE-TOPK" -> "1-row probe vector broadcast",
      "LLM-EMB-PAIRS" -> "small-table self pairs with id band",
      "STREAM-SLIDE" -> "2-row shift frame crossed",
      "TEXT-BIGRAM-LM" -> "1-row vocab totals broadcast",
      "TEXT-BM25" -> "1-row corpus stats broadcast",
      "TEXT-PERPLEXITY" -> "1-row totals broadcast",
      "TEXT-PMI" -> "1-row unigram/bigram totals broadcast",
      "TEXT-TFIDF" -> "1-row doc-count broadcast",
      "TS-HIST-QUANTILE" -> "3-row quantile frame crossed",
      "TS-LOCF" -> "1-row bounds broadcast",
      "TS-XCORR" -> "small lag-grid frame crossed",
      "WIN-FRAME-RANGE" -> "contract shape; -SCALE twin exists",
      "WIN-LAG-LEAD" -> "contract shape; -SCALE twin exists",
      "WIN-LAG-LEAD-SCALE" -> "edge-row window over bucket summaries",
      "WIN-NTILE" -> "contract shape; -SCALE twin exists",
      "WIN-NTILE-SCALE" -> "tile-offset window over bucket summaries")
    val flagged = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (id, fn) =>
        val r = PlanReport.of(fn(spark, sfDir), execute = false)
        if (r.flags.nonEmpty) Some(id -> r.flags.mkString("; ")) else None
    }
    val unexpected = flagged.filterNot { case (id, _) => allow.contains(id) }
    assert(unexpected.isEmpty,
      s"newly flagged queries (scale regression?):\n${unexpected.mkString("\n")}")
    // and the allowlist must not rot: entries that no longer flag should
    // be removed so the list stays meaningful
    val gone = allow.keySet -- flagged.map(_._1).toSet
    assert(gone.isEmpty, s"allowlist entries no longer flagged — prune: $gone")
  }
}
