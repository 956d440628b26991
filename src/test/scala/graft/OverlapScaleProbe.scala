package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Interval-overlap scale probe (test scope): the naive no-equi-key band
  * theta join (BNLJ — every A interval × every B interval) against the
  * canonical-cell grid join on growing sizes. Run:
  *   sbt "Test/runMain graft.OverlapScaleProbe [nA]" */
object OverlapScaleProbe {
  def main(args: Array[String]): Unit = {
    val nA = args.headOption.map(_.toInt).getOrElse(20000)
    val nB = nA * 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic intervals over a wide domain; spans <= 900
    val domain = 100000000L
    val a: DataFrame = spark.range(nA.toLong)
      .select(col("id").as("a_id"), ((col("id") * 7919L) % domain).as("al"))
      .withColumn("ah", col("al") + 300L + (col("a_id") * 13L) % 600L).cache()
    val b: DataFrame = spark.range(nB.toLong)
      .select(col("id").as("b_id"), ((col("id") * 104729L) % domain).as("bl"))
      .withColumn("bh", col("bl") + 200L + (col("b_id") * 17L) % 700L).cache()
    a.count(); b.count()
    println(s"[overlap] a=$nA b=$nB")

    def time(name: String)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[overlap] $name: $s%.1fs matches=$n%d")
      (s, n)
    }

    val (gSec, gN) = time("grid intervalOverlap") {
      RangeJoin.intervalOverlap(a, "al", "ah", b, "bl", "bh").count()
    }
    val (tSec, tN) = time("naive theta (BNLJ)") {
      a.join(b, col("al") <= col("bh") && col("bl") <= col("ah")).count()
    }
    assert(gN == tN, s"grid=$gN theta=$tN must match")
    println(f"[overlap] speedup=${tSec / gSec}%.1fx")
    spark.stop()
  }
}
