package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.Dedup

/** Scale probe for substring-level dedup (test scope): repeatedSpans on a
  * corpus replicated N× with distinct doc_ids — the WORST case for span
  * detection, because every position of every document becomes repeated
  * (all clones share all shingles), so the flagged set is the entire
  * corpus. Cost must stay ~linear in corpus size: the bucket stats are a
  * count (never a materialized posting list), the mark-back is a semi
  * join, and the merge window is per-doc. A super-linear ratio here means
  * a pair-materializing shape crept in.
  * Run: sbt "Test/runMain graft.SpanScaleProbe [N]" */
object SpanScaleProbe {
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
    val base = spark.table("documents")
    def rep(k: Int): DataFrame = (0 until k).map { i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionAll _)

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[span-scale] $name: $s%.1fs rows=$rows")
      s
    }

    // fastHash (xxhash64) is the scale path; clones make EVERY doc fully
    // flagged, so expected spans == docs (one whole-doc span each, minus
    // sub-8-token docs)
    val t1 = time(s"spans 1x")(
      Dedup.repeatedSpans(rep(1), 8, 2, Dedup.fastHash).count())
    val tn = time(s"spans ${mult}x")(
      Dedup.repeatedSpans(rep(mult), 8, 2, Dedup.fastHash).count())
    println(f"[span-scale] ratio at ${mult}x data: ${tn / t1}%.1fx " +
      f"(linear = ${mult}.0x; super-linear means a pair shape crept in)")

    val ts1 = time(s"scrub 1x") {
      val d = rep(1)
      Dedup.removeSpans(d, Dedup.repeatedSpans(d, 8, 2, Dedup.fastHash)).count()
    }
    val tsn = time(s"scrub ${mult}x") {
      val d = rep(mult)
      Dedup.removeSpans(d, Dedup.repeatedSpans(d, 8, 2, Dedup.fastHash)).count()
    }
    println(f"[span-scale] scrub ratio at ${mult}x data: ${tsn / ts1}%.1fx")
    spark.stop()
  }
}
