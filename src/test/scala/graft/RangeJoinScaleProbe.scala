package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.RangeJoin

/** Range-join scale probe (test scope): the naive no-equi-key theta join
  * (BroadcastNestedLoopJoin — every point × every interval) against the
  * domain-bucketed RangeJoin on growing interval counts. The BNLJ cost is
  * points × intervals; the bucketed cost is points + exploded intervals +
  * per-bucket products. Run:
  *   sbt "Test/runMain graft.RangeJoinScaleProbe [nIntervals]" */
object RangeJoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val nIv = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.register(spark, "/root/testdata/sf0.1")

    val points = spark.table("lineitem").select(col("l_extendedprice").as("p")).cache()
    val nPts = points.count()
    // deterministic synthetic intervals over the price domain, span <= 200
    val intervals: DataFrame = spark.range(nIv.toLong)
      .select(col("id").as("iid"),
        (lit(900.0) + (col("id") * 49.0) % 100000.0).as("lo"))
      .withColumn("hi", col("lo") + 50.0 + (col("iid") * 7.0) % 150.0)
      .cache()
    intervals.count()
    println(s"[rangejoin] points=$nPts intervals=$nIv")

    def time(name: String)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[rangejoin] $name: $s%.1fs matches=$n%d")
      (s, n)
    }

    val (bSec, bMatches) = time("bucketed RangeJoin") {
      RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi").count()
    }
    val (nSec, nMatches) = time("naive theta (BNLJ)") {
      points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi")).count()
    }
    require(bMatches == nMatches, s"match counts differ: $bMatches vs $nMatches")
    println(f"[rangejoin] speedup=${nSec / bSec}%.1fx")
    spark.stop()
  }
}
