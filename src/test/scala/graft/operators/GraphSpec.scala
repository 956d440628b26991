package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank semantics against an in-test reference implementation and
  * closed-form cases. */
class GraphSpec extends SparkSpec {

  /** Reference power iteration with uniform dangling redistribution. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val sq = spark; import sq.implicits._
    Graph.pageRank(edges.toDF("s", "t"), "s", "t", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("cycle: uniform 1/n at any damping and iteration count") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = run(cycle, 7)
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("star with dangling center matches the reference implementation") {
    // leaves 1..5 all point at 6; 6 has no out-edges (dangling)
    val star = (1L to 5L).map(_ -> 6L)
    val got = run(star, 10)
    val exp = refPageRank(star, 10)
    exp.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"node $k") }
    // the hub collects most of the mass
    assert(got(6L) > got(1L) * 3)
    // total rank stays 1 (dangling mass redistributed, not lost)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("random sparse graph matches the reference at 1e-9 across iteration counts") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    for (iters <- Seq(1, 5, 12)) {
      val got = run(edges, iters)
      val exp = refPageRank(edges, iters)
      assert(got.keySet == exp.keySet)
      exp.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-9, s"node $k at iters=$iters") }
      assert(math.abs(got.values.sum - 1.0) < 1e-9)
    }
  }
}
