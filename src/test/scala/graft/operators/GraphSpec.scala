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

  test("pinDecimals replays as the exactly-rounded sequence (still ~exact)") {
    val sq = spark; import sq.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val pinned = Graph.pageRank(edges.toDF("s", "t"), "s", "t",
        iterations = 10, pinDecimals = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = refPageRank(edges, 10)
    // every pinned value sits on the 1e-12 grid and within grid distance
    // of the unpinned reference (10 iterations of <=5e-13 pin error)
    pinned.foreach { case (k, v) =>
      assert(math.abs(v * 1e12 - math.rint(v * 1e12)) < 1e-3, s"off-grid $k")
      assert(math.abs(v - exp(k)) < 1e-8, s"node $k")
    }
  }

  /** Reference Dijkstra over a small weighted digraph. */
  private def refSssp(edges: Seq[(Long, Long, Double)], src: Long): Map[Long, Double] = {
    val adj = edges.groupBy(_._1)
    var dist = Map(src -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, src))(
      Ordering.by[(Double, Long), Double](-_._1))
    while (pq.nonEmpty) {
      val (d0, u) = pq.dequeue()
      if (d0 <= dist.getOrElse(u, Double.MaxValue)) {
        adj.getOrElse(u, Nil).foreach { case (_, v, w) =>
          val nd = d0 + w
          if (nd < dist.getOrElse(v, Double.MaxValue)) {
            dist += v -> nd; pq.enqueue((nd, v))
          }
        }
      }
    }
    dist
  }

  private def runSssp(edges: Seq[(Long, Long, Double)], src: Long,
                      maxHops: Int): Map[Long, Double] = {
    val sq = spark; import sq.implicits._
    Graph.shortestPaths(edges.toDF("s", "t", "w"), "s", "t", "w", src, maxHops)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("shortest paths: chain distances, unreachable absent, early fixpoint") {
    val chain = (1L to 5L).sliding(2).map(s => (s(0), s(1), 1.0)).toSeq ++
      Seq((9L, 10L, 1.0)) // disconnected island
    val got = runSssp(chain, 1L, maxHops = 10)
    assert(got === Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0, 5L -> 4.0))
  }

  test("shortest paths: maxHops bounds the relaxation") {
    val chain = (1L to 8L).sliding(2).map(s => (s(0), s(1), 1.0)).toSeq
    val got = runSssp(chain, 1L, maxHops = 3)
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("shortest paths: weighted digraph matches Dijkstra") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
      (rnd.nextInt(9) + 1).toDouble)).filter(e => e._1 != e._2).distinct
    val got = runSssp(edges, 0L, maxHops = 25)
    val exp = refSssp(edges, 0L)
    assert(got === exp)
  }

  /** Naive reference triangle count: all id-ordered triples. */
  private def refTriangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if und((i, j)) && und((j, k)) && und((i, k))
    } yield 1).size.toLong
  }

  private def runTri(edges: Seq[(Long, Long)]): Long = {
    val sq = spark; import sq.implicits._
    Graph.triangleCount(edges.toDF("s", "t"), "s", "t")
      .collect()(0).getLong(0)
  }

  test("triangle closed forms: K4, path, bowtie, duplicate/reversed edges") {
    assert(runTri(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))) == 4L)
    assert(runTri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    // bowtie: two triangles sharing node 3
    assert(runTri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L))) == 2L)
    // direction, duplicates and self-loops are normalized away
    assert(runTri(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (1L, 3L))) == 1L)
  }

  test("random graph with a hub matches the naive reference") {
    val rnd = new scala.util.Random(11)
    // hub 0 touches everything (worst case for naive wedge joins; the
    // degree orientation keeps its out-degree low instead)
    val hub = (1L to 30L).map(0L -> _)
    val rest = Seq.fill(120)((rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter { case (a, b) => a != b }
    val edges = hub ++ rest
    assert(runTri(edges) == refTriangles(edges))
  }

  /** Reference k-core by sequential peeling. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var active = (und.map(_._1) ++ und.map(_._2)).toSet
    var done = false
    var deg = Map.empty[Long, Long]
    while (!done) {
      val live = und.filter { case (a, b) => active(a) && active(b) }
      deg = (live.map(_._1) ++ live.map(_._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val next = deg.filter(_._2 >= k).keySet
      done = next == active
      active = next
    }
    deg.filter { case (n, d) => active(n) && d >= k }
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val sq = spark; import sq.implicits._
    Graph.kCore(edges.toDF("s", "t"), "s", "t", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: a triangle with a tail peels to the triangle at k=2") {
    // 1-2-3 triangle, tail 3-4-5: the tail cascades away
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    assert(runKCore(edges, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(runKCore(edges, 3) === Map.empty)
    assert(runKCore(edges, 1) === refKCore(edges, 1))
  }

  test("kCore: a long chain cascades to empty (the many-round case)") {
    val chain = (0L until 30L).map(i => (i, i + 1))
    assert(runKCore(chain, 2) === Map.empty)
  }

  test("kCore: random graph matches the sequential peeling reference") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    for (k <- Seq(2, 4, 6))
      assert(runKCore(edges, k) === refKCore(edges, k), s"diverged at k=$k")
  }
}
