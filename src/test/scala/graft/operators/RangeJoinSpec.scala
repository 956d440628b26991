package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed point-in-interval join vs the naive theta join. */
class RangeJoinSpec extends SparkSpec {

  test("matches the naive theta join, including interval-longer-than-bucket shapes") {
    val sq = spark
    import sq.implicits._
    val pts = Seq.tabulate(200)(i => (i.toLong, i * 3.5 - 100)).toDF("pid", "p")
    // mixed spans: tiny, medium, one HUGE interval (wider than any
    // domain/nb bucket), a degenerate hi < lo, negatives
    val ivs = Seq(
      (1L, 0.0, 10.0), (2L, -50.0, -40.0), (3L, 100.0, 450.0),
      (4L, 5.0, 5.0), (5L, 600.0, 100.0), (6L, -200.0, 590.0)
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", buckets = 16)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(ivs)
      .where(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === naive)
    assert(naive.nonEmpty && !naive.exists(_._2 == 5L))
  }

  test("empty inputs and single-point domain") {
    val sq = spark
    import sq.implicits._
    val pts = Seq((1L, 7.0)).toDF("pid", "p")
    val noIv = Seq.empty[(Long, Double, Double)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, "p", noIv, "lo", "hi").count() === 0)
    val oneIv = Seq((1L, 7.0, 7.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, "p", oneIv, "lo", "hi").count() === 1)
    val noPts = Seq.empty[(Long, Double)].toDF("pid", "p")
    assert(RangeJoin.pointInInterval(noPts, "p", oneIv, "lo", "hi").count() === 0)
  }
}
