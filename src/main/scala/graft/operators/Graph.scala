package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists — the iterative-join family next to
  * `graft.llm.Dedup.connectedComponents*` (which serves the dedup
  * clustering use case; this serves ranking).
  *
  * 100 TB story: each PageRank iteration is ONE key-equality join
  * (ranks × edges on src) and ONE hash aggregation (contributions by
  * dst) — the textbook distributed formulation; degrees are computed once
  * and cached; per-iteration scalar reads (dangling mass) are one-row
  * aggregates, metadata-scale; `graft.core.CheckpointChain` truncates the
  * growing lineage and bounds cached state to one generation, exactly as
  * the connected-components loop does. Skewed hubs shuffle like any hot
  * join key (AQE skew split / `Skew.saltedJoin` apply unchanged).
  */
object Graph {

  /** PageRank over directed edges (`srcCol`, `dstCol`), damping `d`,
    * `iterations` synchronous power-iteration steps from the uniform
    * start. Dangling nodes (no out-edges) redistribute their mass
    * uniformly — the standard stochastic-matrix completion, so total rank
    * stays 1 every iteration. Returns (node, rank).
    *
    * Deterministic up to floating-point summation order (contributions
    * per dst are a parallel double sum) — assert ranks to a tolerance,
    * not bit-exactly, across cluster layouts. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, d: Double = 0.85,
               pinDecimals: Int = 0): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(d > 0 && d < 1, s"damping must be in (0,1), got $d")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      // keyed repartition before the checkpoint: narrow-op lineage would
      // pin the parent's partition count for all `iterations` scans; the
      // shuffle lets AQE size the static side once (and clusters it by the
      // per-iteration join key)
      .repartition(col("src"))
      .localCheckpoint()
    // lazy checkpoints: the single stats aggregate below materializes BOTH
    // (node count + dangling detection in one job, instead of count +
    // isEmpty + two eager checkpoint jobs)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(eager = false)
    // exactly-rounded state pinning (the STREAM-ANOMALY recipe): with
    // pinDecimals > 0 every stored rank is floor(x·10^p + 0.5)/10^p, so a
    // SQL replay of the same pinned sequence hash-matches bit-for-bit —
    // per-iteration fp drift (~1e-16) never survives the pin. 0 = off
    // (the default; cluster runs assert to a tolerance instead).
    val pinF = math.pow(10, pinDecimals)
    def pin(c: org.apache.spark.sql.Column) =
      if (pinDecimals > 0) floor(c * pinF + 0.5) / pinF else c
    def pinS(x: Double) =
      if (pinDecimals > 0) math.floor(x * pinF + 0.5) / pinF else x

    // one-time: node count + does the graph have dangling nodes at all?
    // (when it does not — common for contracted graphs — the
    // per-iteration dangling-mass aggregate is skipped entirely). One
    // aggregate answers both and materializes both lazy checkpoints.
    val statsRow = nodes.join(deg, Seq("node"), "left")
      .agg(count(lit(1)), count(col("deg"))).head()
    val n = statsRow.getLong(0).toDouble
    val hasDangling = statsRow.getLong(1) < statsRow.getLong(0)

    val chain = new graft.core.CheckpointChain(spark)
    // per-iteration dangling mass (total rank on out-edge-less nodes). The
    // anti-join formulation equals the old deg-isNull filter: deg has one
    // row per out-edged node.
    def danglingOf(df: DataFrame): Double =
      pinS(df.join(deg, Seq("node"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0))
    var ranks = nodes.withColumn("rank", pin(lit(1.0 / n)))
    var dangling = if (hasDangling) danglingOf(ranks) else 0.0
    for (i <- 1 to iterations) {
      val contribs = ranks.join(deg, Seq("node"))
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      val nr = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          pin(lit((1.0 - d) / n) + lit(d) *
            (coalesce(col("c"), lit(0.0)) + lit(dangling / n))).as("rank"))
      if (i == iterations) ranks = chain.next(nr)
      else if (hasDangling) {
        // the dangling scalar rides the SAME job that materializes the
        // iteration's checkpoint — one job per iteration, not two
        val (r2, d2) = chain.nextWith(nr)(danglingOf)
        ranks = r2
        dangling = d2
      }
      // without dangling nodes NO per-iteration action is needed at all:
      // iterations stay lazy and only a periodic eager checkpoint bounds
      // the replayed lineage — ~1 job per 3 iterations instead of 1 per
      // iteration (values are identical: each stored rank is pinned)
      else if (i % 3 == 0) ranks = chain.next(nr)
      else ranks = nr
    }
    ranks
  }

  /** Single-source shortest paths over a weighted directed edge list —
    * synchronous Bellman-Ford relaxation, `maxHops` rounds (or early stop
    * at a fixpoint). Returns (node, dist) for every node reached within
    * `maxHops` edges; unreachable nodes are absent.
    *
    * Each round is ONE key-equality join (frontier × edges on src) and
    * ONE min-aggregation by dst — the textbook distributed relaxation;
    * `CheckpointChain` bounds lineage and cached state to one generation,
    * as the PageRank and connected-components loops do. Rounds needed =
    * the (hop-bounded) graph diameter; at 100 TB the per-round cost is a
    * shuffle of the CURRENT distance frontier, never all paths. Early
    * stop: distances only ever decrease, so an exact decimal sum of
    * (count, dist) reaching a fixpoint ends the loop before `maxHops` on
    * shallow graphs. */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, source: Long,
                    maxHops: Int = 10): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("double").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      // see pageRank: AQE-sizable static side, clustered by the join key
      .repartition(col("src"))
      .localCheckpoint()
    val chain = new graft.core.CheckpointChain(spark)
    // convergence fingerprint fused into the round's checkpoint job
    // (CheckpointChain.nextWith): one Spark job per relaxation round
    def fingerprint(df: DataFrame): Seq[Any] =
      df.agg(count(lit(1)), sum(col("dist").cast("decimal(38,6)"))).collect()(0).toSeq
    var (dist, prev) = chain.nextWith(
      e.sparkSession.range(1).select(lit(source).as("node"), lit(0.0).as("dist")))(
      fingerprint)
    var hops = 0
    var converged = false
    while (hops < maxHops && !converged) {
      val relaxed = dist.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        .union(dist)
        .groupBy("node").agg(min("dist").as("dist"))
      val (nd, s) = chain.nextWith(relaxed)(fingerprint)
      dist = nd
      converged = s == prev
      prev = s
      hops += 1
    }
    dist
  }

  /** Exact triangle count over an undirected edge list (first two columns
    * = endpoints; direction, duplicates and self-loops are normalized
    * away). Returns one row: `n_triangles`.
    *
    * Algorithm: degree orientation (Chiba–Nishizeki / the MapReduce
    * formulation of Suri & Vassilvitskii WWW'11). Each undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher; wedges
    * are pairs of out-edges at a node, and a triangle is a wedge whose
    * outer pair is itself an oriented edge. Out-degrees under this
    * orientation are O(√m), so the wedge set — the only intermediate that
    * can exceed the input — is bounded by Σ outdeg² = O(m^1.5) REGARDLESS
    * of hub skew, where the naive neighbor-join explodes quadratically on
    * the hottest vertex. Both stages are key-equality joins + one count:
    * the 100 TB shape, no cartesian anywhere. */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("u").as("x")).union(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("dg"))
    // total order for orientation: (degree, id) — ties broken by id
    val withDeg = und
      .join(deg.select(col("x").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("src"),
      when(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")), col("v"))
        .otherwise(col("u")).as("dst"))
      .localCheckpoint()
    // wedges at the LOW end: unordered out-neighbor pairs {b, c} emitted
    // once in id order, then probed against the id-canonical undirected
    // edge set — a pure two-column equi join (the OR-of-orientations
    // probe would plan as a nested-loop join)
    val o1 = oriented.select(col("src").as("a"), col("dst").as("b"))
    val o2 = oriented.select(col("src").as("a2"), col("dst").as("c"))
    val wedges = o1.join(o2, col("a") === col("a2") && col("b") < col("c"))
      .select("b", "c")
    wedges.join(und, col("b") === col("u") && col("c") === col("v"),
        "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition membership: the maximal subgraph in which every
    * node has degree ≥ k (unique, so order-free and oracle-hashable).
    * Input edges are normalized to undirected distinct pairs; returns
    * `(node, dg)` — the surviving nodes with their within-core degree.
    *
    * Synchronous peeling: each round restricts edges to both-endpoints-
    * active (two semi joins), recounts degrees (one aggregate), and drops
    * nodes below k — all key-equality, the per-round cost is a shuffle of
    * the LIVE edge set, which only shrinks. Rounds ≤ the peeling depth
    * (typically ≪ n; the adversarial chain is Ω(n), which is why the loop
    * is fingerprint-stopped and CheckpointChain-bounded like SSSP/CC, not
    * fixed-count). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = edges.sparkSession
    val und = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("u"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct().localCheckpoint()
    val chain = new graft.core.CheckpointChain(spark)
    def degrees(act: DataFrame): DataFrame = {
      val live = und
        .join(act.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(act.select(col("node").as("v")), Seq("v"), "left_semi")
      live.select(col("u").as("node")).union(live.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
    }
    // the surviving-node count rides the round's checkpoint job
    // (CheckpointChain.nextWith): one Spark job per peeling round
    var (active, prev) = chain.nextWith(
      und.select(col("u").as("node")).union(und.select(col("v"))).distinct())(
      _.count())
    var converged = false
    var rounds = 0
    while (rounds < maxRounds && !converged) {
      val (next, n) = chain.nextWith(
        degrees(active).where(col("dg") >= k).select("node"))(_.count())
      converged = n == prev // monotone shrink: equal size == fixpoint
      prev = n
      active = next
      rounds += 1
    }
    degrees(active).where(col("dg") >= k)
  }
}
