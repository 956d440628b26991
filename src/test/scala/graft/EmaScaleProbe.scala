package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SegmentedEma

/** EMA scale probe (test scope): times the TS-EMA contract shape (ordered
  * whole-series collect + fold — one array per series on one task) against
  * the SegmentedEma chunked affine decomposition on an N× replicated
  * corpus, and cross-checks the 4dp results. The contract shape's
  * per-series array grows with the corpus; the segmented path's largest
  * task state is one chunk. Run: sbt "Test/runMain graft.EmaScaleProbe [N]" */
object EmaScaleProbe {
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

    // distinct ids, ts shifted per replica: the key domain grows with the
    // corpus (the realistic monster-series shape)
    val ev = spark.table("events")
    val spanSec = 400000L
    val events: DataFrame = (0 until mult).map { i =>
      ev.select(col("event_type"),
        (col("event_id") + lit(i * 10000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${i * spanSec} SECOND")).as("ts"),
        col("value"))
    }.reduce(_ unionAll _).cache()
    val n = events.count()
    println(s"[emascale] events=$n (${mult}x sf0.1, ${ev.select("event_type").distinct.count} series)")

    def time(name: String)(f: => Array[org.apache.spark.sql.Row]): (Double, Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[emascale] $name: $s%.1fs")
      (s, r)
    }

    val (gSec, gRows) = time("whole-series fold (contract shape)") {
      events.groupBy("event_type")
        .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
          _.getField("value")).as("vals"))
        .select(col("event_type"), size(col("vals")).as("n"),
          round(aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1),
            element_at(col("vals"), 1),
            (acc, x) => acc * 0.7 + x * 0.3), 4).as("ema"))
        .orderBy("event_type").collect()
    }

    val (sSec, sRows) = time("segmented affine fold") {
      SegmentedEma.emaFinal(events, Seq("event_type"), col("ts").cast("double"),
          Seq(col("ts"), col("event_id")), col("value"))
        .select(col("event_type"), col("n").cast("int").as("n"),
          round(col("ema"), 4).as("ema"))
        .orderBy("event_type").collect()
    }

    val agree = gRows.map(_.toString).sameElements(sRows.map(_.toString))
    println(f"[emascale] agree=$agree speedup=${gSec / sSec}%.1fx")
    require(agree, "segmented EMA diverged from the sequential fold at 4dp")

    // Holt shares the identical two-aggregate plan; time its twins too
    val (hgSec, hgRows) = time("whole-series Holt fold (contract shape)") {
      events.groupBy("event_type")
        .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
          _.getField("value")).as("vals"))
        .select(col("event_type"),
          round(element_at(aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1),
            array(element_at(col("vals"), 1), lit(0.0)),
            (acc, x) => array(
              lit(0.3) * x + lit(0.7) * (element_at(acc, 1) + element_at(acc, 2)),
              lit(0.2) * ((lit(0.3) * x + lit(0.7) * (element_at(acc, 1) + element_at(acc, 2)))
                - element_at(acc, 1)) + lit(0.8) * element_at(acc, 2))), 1), 4).as("level"))
        .orderBy("event_type").collect()
    }
    val (hsSec, hsRows) = time("segmented Holt (matrix affine)") {
      graft.operators.SegmentedHolt.holtFinal(events, Seq("event_type"),
          col("ts").cast("double"), Seq(col("ts"), col("event_id")), col("value"))
        .select(col("event_type"), round(col("level"), 4).as("level"))
        .orderBy("event_type").collect()
    }
    val hAgree = hgRows.map(_.toString).sameElements(hsRows.map(_.toString))
    println(f"[emascale] holt agree=$hAgree speedup=${hgSec / hsSec}%.1fx")
    require(hAgree, "segmented Holt diverged from the sequential fold at 4dp")

    // Holt-Winters: the 6-state rotating-seasonal fold vs the 6×6 affine
    val (wgSec, wgRows) = time("whole-series Holt-Winters fold (contract shape)") {
      def hwStep(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) = {
        val lNew = lit(0.3) * (x - element_at(acc, 3)) +
          lit(0.7) * (element_at(acc, 1) + element_at(acc, 2))
        array(lNew,
          lit(0.2) * (lNew - element_at(acc, 1)) + lit(0.8) * element_at(acc, 2),
          element_at(acc, 4), element_at(acc, 5), element_at(acc, 6),
          lit(0.3) * (x - lNew) + lit(0.7) * element_at(acc, 3))
      }
      events.groupBy("event_type")
        .agg(transform(array_sort(collect_list(struct(col("ts"), col("event_id"), col("value")))),
          _.getField("value")).as("vals"))
        .select(col("event_type"),
          round(element_at(aggregate(slice(col("vals"), lit(2), size(col("vals")) - 1),
            array(element_at(col("vals"), 1), lit(0.0), lit(0.0), lit(0.0),
              lit(0.0), lit(0.0)), hwStep), 1), 4).as("level"))
        .orderBy("event_type").collect()
    }
    val (wsSec, wsRows) = time("segmented Holt-Winters (6x6 affine)") {
      val (m, c) = graft.operators.SegmentedAffine.holtWintersStep(0.3, 0.2, 0.3)
      graft.operators.SegmentedAffine.affineFinal(events, Seq("event_type"),
          col("ts").cast("double"), Seq(col("ts"), col("event_id")), col("value"),
          m, c)
        .select(col("event_type"), round(element_at(col("s"), 1), 4).as("level"))
        .orderBy("event_type").collect()
    }
    val wAgree = wgRows.map(_.toString).sameElements(wsRows.map(_.toString))
    println(f"[emascale] holt-winters agree=$wAgree speedup=${wgSec / wsSec}%.1fx")
    require(wAgree, "segmented Holt-Winters diverged from the sequential fold at 4dp")
    spark.stop()
  }
}
