package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Skewed-hub scale probe for the iterative graph family (test scope):
  * the declared GRAPH-* queries run on the nation-contracted trade graph
  * (tiny); this probe drives kCore and triangleCount on synthetic
  * POWER-LAW hub graphs decades bigger, the degree distribution a real
  * co-occurrence/dedup graph has.
  *
  * Construction (analytic, so the answers are exact):
  *  - H = 32 hubs form a CLIQUE (C(32,2) = 496 edges);
  *  - every other node is a leaf attached to hub `id % H` — hub degrees
  *    are ~n/H (heavy skew: the degree count and the semi joins all hit
  *    the same few keys).
  * Then: k-core at k = H/2 is EXACTLY the hub clique (leaves have degree
  * 1 and peel in round one; hubs keep degree H-1 ≥ k afterwards), so the
  * LIVE EDGE SET must shrink from n to C(H,2) after a single peel round —
  * the shrink-rate claim under skew. Triangles = C(H,3) = 4960 exactly
  * (stars are triangle-free), with the skewed wedge counts stressing the
  * join.
  *
  * Asserts exact answers at every decade and near-linear wall-time
  * curvature (10× data ≤ ~15× time — super-linear means a pair-
  * materializing or all-rounds-full-size shape crept in).
  * Run: sbt "Test/runMain graft.GraphSkewProbe [maxDecade]" */
object GraphSkewProbe {
  private val H = 32

  def main(args: Array[String]): Unit = {
    val maxDecade = args.headOption.map(_.toInt).getOrElse(7) // 10^7 nodes
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def hubGraph(n: Long): DataFrame = {
      val hubs = spark.range(H).select(col("id").as("a"))
        .crossJoin(spark.range(H).select(col("id").as("b")))
        .where(col("a") < col("b"))
      val leaves = spark.range(H, n)
        .select((col("id") % H).as("a"), col("id").as("b"))
      hubs.unionAll(leaves)
    }

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    var prevCore = -1.0
    var prevTri = -1.0
    for (d <- 5 to maxDecade) {
      val n = math.pow(10, d).toLong
      val g = hubGraph(n).localCheckpoint()

      val (coreRows, coreSec) = time {
        Graph.kCore(g, "a", "b", k = H / 2).collect()
      }
      assert(coreRows.length == H, s"n=$n: core must be exactly the $H hubs, " +
        s"got ${coreRows.length}")
      assert(coreRows.forall(_.getLong(1) == H - 1),
        s"n=$n: every hub's in-core degree must be ${H - 1}")

      val (tri, triSec) = time {
        Graph.triangleCount(g, "a", "b").collect()(0).getLong(0)
      }
      val expectTri = H.toLong * (H - 1) * (H - 2) / 6
      assert(tri == expectTri, s"n=$n: expected $expectTri triangles, got $tri")

      val coreCurve = if (prevCore > 0) f"${coreSec / prevCore}%.1fx" else "-"
      val triCurve = if (prevTri > 0) f"${triSec / prevTri}%.1fx" else "-"
      println(f"[graph-skew] n=$n%,d edges=${n - H + 496}%,d " +
        f"kcore=$coreSec%.1fs (vs prev decade $coreCurve) " +
        f"triangles=$triSec%.1fs (vs prev decade $triCurve)")
      if (prevCore > 0)
        assert(coreSec / prevCore < 15.0,
          f"kCore wall time grew ${coreSec / prevCore}%.1fx over a 10x decade")
      if (prevTri > 0)
        assert(triSec / prevTri < 15.0,
          f"triangleCount wall time grew ${triSec / prevTri}%.1fx over a 10x decade")
      prevCore = coreSec
      prevTri = triSec
    }
    spark.stop()
  }
}
