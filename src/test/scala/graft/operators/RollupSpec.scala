package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RollupSpec extends SparkSpec {

  private def listFiles(dir: String): Map[String, Long] = {
    val base = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(base.getAbsolutePath) -> f.lastModified())
      .toMap
  }

  test("incrementalRollup touches only the named partitions and matches a full recompute") {
    tables()
    val tmp = Files.createTempDirectory("rollup").toString
    val rawPath = s"$tmp/raw"
    val rollPath = s"$tmp/rollup"

    val raw = spark.table("events").select(
      col("event_type"), col("value"),
      (col("ts").cast("long") - (col("ts").cast("long") % 86400)).as("day"))
    raw.write.partitionBy("day").parquet(rawPath)
    val allDays = raw.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

    // initial full build
    Layout.incrementalRollup(spark, rawPath, rollPath,
      "day", Seq("event_type"), "value", allDays)
    val before = listFiles(rollPath)

    // a late delta lands in ONE day: overwrite that raw partition with extra rows
    val hot = allDays.head
    val hotRows = spark.read.parquet(rawPath)
      .where(col("day").cast("string") === hot)
    val delta = hotRows.limit(50).withColumn("value", col("value") + 1000.0)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try hotRows.unionByName(delta).localCheckpoint()
      .write.mode("overwrite").partitionBy("day").parquet(rawPath)
    finally prev.foreach(spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))

    // incremental maintenance of just the hot day
    Layout.incrementalRollup(spark, rawPath, rollPath,
      "day", Seq("event_type"), "value", Seq(hot))
    val after = listFiles(rollPath)

    // cold partitions keep their exact files; only the hot day was rewritten
    val coldBefore = before.filterNot(_._1.contains(s"day=$hot"))
    val coldAfter = after.filterNot(_._1.contains(s"day=$hot"))
    assert(coldBefore === coldAfter, "cold rollup partitions must be untouched")
    assert(before.keys.filter(_.contains(s"day=$hot")).toSet !=
      after.keys.filter(_.contains(s"day=$hot")).toSet ||
      before.filter(_._1.contains(s"day=$hot")) != after.filter(_._1.contains(s"day=$hot")),
      "hot rollup partition must be rewritten")

    // and the maintained rollup equals a from-scratch recompute
    val full = spark.read.parquet(rawPath)
      .groupBy("event_type", "day")
      .agg(sum("value").as("sv"), count(lit(1)).as("c"),
        min("value").as("mn"), max("value").as("mx"))
    val maintained = spark.read.parquet(rollPath)
    val fullC = canon(full.orderBy("event_type", "day"))
    val mainC = canon(maintained.select("event_type", "day", "sv", "c", "mn", "mx")
      .orderBy("event_type", "day"))
    assert(mainC === fullC)
  }
}
