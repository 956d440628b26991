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
               iterations: Int = 10, d: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(d > 0 && d < 1, s"damping must be in (0,1), got $d")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count().toDouble
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()

    val chain = new graft.core.CheckpointChain(spark)
    var ranks = chain.next(
      nodes.withColumn("rank", lit(1.0 / n)))
    for (_ <- 1 to iterations) {
      val withDeg = ranks.join(deg, Seq("node"), "left")
      // one-row aggregate: total rank parked on dangling nodes
      val dangling = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.where(col("deg").isNotNull)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      ranks = chain.next(
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit((1.0 - d) / n) + lit(d) *
              (coalesce(col("c"), lit(0.0)) + lit(dangling / n))).as("rank")))
    }
    ranks
  }
}
