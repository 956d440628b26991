package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Scratch A/B probe (test scope): times current impls of the slowest
  * queries against candidate rewrites at sf0.1. Not driver contract. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, sfDir)
    def dec(p: Int, s: Int) = DecimalType(p, s)

    def time(name: String)(f: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f.collect().length
        if (i > 1) println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
      }
    }

    // ---- AGG-TPCH-Q1: current (single-split scan feeds partial agg) ----
    def q1(src: DataFrame): DataFrame = src
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity").cast(dec(18, 2))).cast("double"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast(dec(18, 2))).cast("double"), 2).as("sum_base"),
        round(avg(col("l_discount").cast(dec(18, 6))).cast("double"), 4).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")
    time("q1-current")(q1(spark.table("lineitem")))
    time("q1-spread")(q1(Tables.spread(spark.table("lineitem"), "l_orderkey")))

    // ---- AGG-MEDIAN: percentile agg vs window-rank interpolation ----
    time("median-current")(Tables.spread(spark.table("orders"), "o_orderkey")
      .groupBy("o_orderstatus")
      .agg(round(percentile(col("o_totalprice"), lit(0.5)).cast("double"), 2).as("med"),
        round(percentile(col("o_totalprice"), lit(0.9)).cast("double"), 2).as("p90"))
      .orderBy("o_orderstatus"))
    time("median-nospread")(spark.table("orders")
      .groupBy("o_orderstatus")
      .agg(round(percentile(col("o_totalprice"), lit(0.5)).cast("double"), 2).as("med"),
        round(percentile(col("o_totalprice"), lit(0.9)).cast("double"), 2).as("p90"))
      .orderBy("o_orderstatus"))
    time("median-window") {
      val w = Window.partitionBy("o_orderstatus").orderBy("v")
      val cw = Window.partitionBy("o_orderstatus")
      val ranked = spark.table("orders")
        .select(col("o_orderstatus"), col("o_totalprice").cast("double").as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(cw))
      // positions are per-group constants; filter to the 4 candidate rows
      val withPos = ranked
        .withColumn("pos50", lit(1.0) + (col("cnt") - 1).cast("double") * lit(0.5))
        .withColumn("pos90", lit(1.0) + (col("cnt") - 1).cast("double") * lit(0.9))
      def interp(pos: String) = {
        val l = floor(col(pos))
        val vl = max(when(col("rn") === l, col("v")))
        val vu = coalesce(max(when(col("rn") === l + 1, col("v"))), vl)
        round(vl + (max(col(pos)) - max(floor(col(pos)))) * (vu - vl), 2)
      }
      withPos
        .where((col("rn") >= floor(col("pos50"))) && (col("rn") <= floor(col("pos50")) + 1) ||
               (col("rn") >= floor(col("pos90"))) && (col("rn") <= floor(col("pos90")) + 1))
        .groupBy("o_orderstatus")
        .agg(interp("pos50").as("med"), interp("pos90").as("p90"))
        .orderBy("o_orderstatus")
    }

    // ---- TEXT-BIGRAMS: transform(sequence) vs explode+window lead ----
    val docs = Tables.spread(spark.table("documents"), "doc_id")
    time("bigrams-current") {
      val t = split(col("text"), " ")
      docs.select(explode(transform(sequence(lit(1), size(t) - 1),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram")).limit(20)
    }
    time("bigrams-zip") {
      val t = split(col("text"), " ")
      docs.select(explode(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram")).limit(20)
    }

    spark.stop()
  }
}
