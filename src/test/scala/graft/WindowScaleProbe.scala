package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.operators.GlobalWindow

/** Global-window scale probe (test scope): times the single-partition
  * contract shapes against the GlobalWindow bucketed twins on an N×
  * replicated corpus. The contract shapes funnel every row through ONE
  * partition (Spark's "No Partition Defined" warning); the twins keep all
  * cores busy — the gap here is the 100 TB story in miniature.
  * Run: sbt "Test/runMain graft.WindowScaleProbe [N]" */
object WindowScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, "/root/testdata/sf0.1")

    // distinct ids; ts shifted per replica so the key domain grows with the
    // corpus (the realistic shape — not one pathological tie cluster)
    val ev = spark.table("events")
    val spanSec = 400000L
    val events: DataFrame = (0 until mult).map { i =>
      ev.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${i * spanSec} SECOND")).as("ts"))
    }.reduce(_ unionAll _).cache()
    val nev = events.count()
    val ord = spark.table("orders")
    val orders: DataFrame = (0 until mult).map { i =>
      ord.select((col("o_orderkey") + lit(i * 100000000L)).as("o_orderkey"),
        col("o_totalprice"))
    }.reduce(_ unionAll _).cache()
    val nord = orders.count()
    println(s"[winscale] events=$nev orders=$nord (${mult}x sf0.1)")

    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[winscale] $name: $s%.1fs")
      s
    }

    val dec182 = DecimalType(18, 2)

    val gLag = time("lag-lead GLOBAL") {
      val w = Window.orderBy("ts", "event_id")
      events.select(col("event_id"), lag("event_id", 1).over(w).as("p"),
          lead("event_id", 1).over(w).as("n"))
        .agg(sum("p"), sum("n")).collect()
    }
    val bLag = time("lag-lead BUCKETED") {
      GlobalWindow.lagLead(events, col("ts").cast("double"),
          Seq("ts", "event_id"), "event_id", prevName = "p", nextName = "n")
        .agg(sum("p"), sum("n")).collect()
    }

    val gNtile = time("ntile GLOBAL") {
      val w = Window.orderBy(col("o_totalprice").cast(dec182).desc, col("o_orderkey"))
      orders.select(ntile(4).over(w).as("q")).agg(sum("q")).collect()
    }
    val bNtile = time("ntile BUCKETED") {
      GlobalWindow.ntileGlobal(orders, negate(col("o_totalprice").cast("double")),
          Seq(col("o_totalprice").cast(dec182).desc, col("o_orderkey")), 4, tileName = "q")
        .agg(sum("q")).collect()
    }

    val gRange = time("range-count GLOBAL") {
      val w = Window.orderBy(col("o_totalprice").cast(dec182))
        .rangeBetween(-1000, Window.currentRow)
      orders.select(count(lit(1)).over(w).as("c")).agg(sum("c")).collect()
    }
    val bRange = time("range-count BUCKETED") {
      GlobalWindow.rangeCount(orders, col("o_totalprice").cast(dec182), 1000L, cntName = "c")
        .agg(sum("c")).collect()
    }

    println(f"[winscale] speedup lag=${gLag / bLag}%.1fx ntile=${gNtile / bNtile}%.1fx range=${gRange / bRange}%.1fx")
    spark.stop()
  }
}
