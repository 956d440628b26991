package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Top-k-per-group scale probe (test scope): the bounded-heap aggregate
  * (graft_topk_by) against the row_number window formulation on an N×
  * replicated lineitem. The window plan must shuffle EVERY row to its
  * group's reducer and sort the whole group; the heap plan ships at most
  * k rows per group per map partition. The per-group row count is what
  * grows at 100 TB — this probe grows it 20× and asserts both agree.
  * Run: sbt "Test/runMain graft.TopKScaleProbe [N]" */
object TopKScaleProbe {
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
    graft.functions.expressions.GraftFunctions.register(spark)

    // distinct items per replica; same 3 return-flag groups (the skewed
    // worst case for the window: every row of a 20x corpus sorts inside
    // one of three partitions)
    val li = spark.table("lineitem").select("l_returnflag", "l_extendedprice",
      "l_orderkey", "l_linenumber")
    val big: DataFrame = (0 until mult).map { i =>
      li.select(col("l_returnflag"), col("l_extendedprice"),
        (col("l_orderkey") + lit(i * 100000000L)).as("l_orderkey"),
        col("l_linenumber"))
    }.reduce(_ unionAll _).cache()
    val n = big.count()
    println(s"[topkscale] lineitem rows=$n (${mult}x sf0.1), 3 groups, k=10")

    val item = concat(col("l_orderkey").cast("string"), lit("#"),
      col("l_linenumber").cast("string"))

    def heap(): DataFrame = big.groupBy("l_returnflag")
      .agg(call_function("graft_topk_by", col("l_extendedprice"), item, lit(10)).as("arr"))
      .select(col("l_returnflag"), posexplode(col("arr")))
      .select(col("l_returnflag"), col("col.ord").as("price"), col("col.item").as("it"))

    def window(): DataFrame = {
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_extendedprice").desc, item)
      big.select(col("l_returnflag"), col("l_extendedprice").as("price"), item.as("it"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 10).select("l_returnflag", "price", "it")
    }

    def time(name: String)(f: => DataFrame): (Double, Seq[String]) = {
      // warm once, then measure
      f.collect()
      val t0 = System.nanoTime()
      val rows = f.collect().map(_.mkString("|")).toSeq.sorted
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[topkscale] $name%-8s $s%7.2f s")
      (s, rows)
    }

    val (th, rh) = time("heap")(heap())
    val (tw, rw) = time("window")(window())
    assert(rh == rw, "heap top-k diverges from window top-k at scale")
    println(f"[topkscale] agree on ${rh.size} rows; window/heap = ${tw / th}%.1fx")
    spark.stop()
  }
}
