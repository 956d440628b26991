package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomIndexSpec extends SparkSpec {

  test("per-file bloom index prunes point lookups without losing rows") {
    tables()
    val dir = Files.createTempDirectory("bloomidx").toString + "/events"
    // range-layout by user so each file covers a disjoint user slice —
    // the layout a bloom index is built to exploit
    spark.table("events")
      .repartitionByRange(8, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val nFiles = Layout.writeBloomIndex(spark, dir, "user_id",
      expectedItemsPerFile = 10000L, fpp = 0.01)
    assert(nFiles === 8L)

    val probe = spark.table("events").select(max("user_id")).collect()(0).getLong(0)
    val (keep, total) = Layout.bloomPruneFiles(spark, dir, "user_id", Seq(probe))
    assert(total === 8)
    assert(keep.nonEmpty && keep.size <= 2,
      s"range-partitioned probe should touch ~1 file, got ${keep.size}")

    val pruned = canon(Layout.bloomPrunedRead(spark, dir, "user_id", Seq(probe))
      .orderBy("event_id"))
    val full = canon(spark.read.parquet(dir).where(col("user_id") === probe)
      .orderBy("event_id"))
    assert(pruned === full)
    assert(full.nonEmpty)
  }

  test("string keys probe compatibly and absent values read zero files") {
    tables()
    val dir = Files.createTempDirectory("bloomidx").toString + "/docs"
    spark.table("documents").repartitionByRange(4, col("source"))
      .write.mode("overwrite").parquet(dir)
    Layout.writeBloomIndex(spark, dir, "source", 10000L, 0.01)
    val srcs = spark.table("documents").select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val one = srcs.head
    val pruned = Layout.bloomPrunedRead(spark, dir, "source", Seq(one))
    assert(pruned.count() ===
      spark.table("documents").where(col("source") === one).count())
    // a value that never occurs: no false negatives possible, and with
    // fpp=1% over 4 files the expected keep list is empty
    val (keepMissing, _) =
      Layout.bloomPruneFiles(spark, dir, "source", Seq("no-such-source-xyz"))
    assert(keepMissing.size <= 1)
    assert(Layout.bloomPrunedRead(spark, dir, "source",
      Seq("no-such-source-xyz")).count() === 0L)
  }
}
