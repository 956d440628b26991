package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.storage.dsv2.SnapshotScan

/** Transform partitioning — days/months/hours/bucket fields: tuples
  * store transform ordinals, the evaluator maps them back to source
  * intervals (or hash buckets) and prunes; ALIGNED time predicates are
  * decidable for every file (consumable, metadata-delete-provable),
  * unaligned ones prune but stay residual. */
class SnapshotTransformPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snaptf").toString + "/t"

  private val MicrosPerDay = 86400000000L

  private def scanOf(df: DataFrame): SnapshotScan = {
    df.collect()
    ((df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan }
      ) ++ df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case b: BatchScanExec => b.scan }
    }.flatten).collectFirst { case s: SnapshotScan => s }
      .getOrElse(fail(s"no SnapshotScan in:\n${df.queryExecution.executedPlan}"))
  }

  private def filterNodes(df: DataFrame) =
    df.queryExecution.executedPlan.collect { case f: FilterExec => f } ++
      df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case f: FilterExec => f }
      }.flatten

  /** 8 UTC days × 1000 rows each, second granularity. */
  private def writeDays(root: String): Unit =
    spark.range(8000).select(col("id").as("k"),
      timestamp_micros(expr("id div 1000") * MicrosPerDay +
        (col("id") % 1000) * 1000000L).as("ts"))
      .write.format("graft-snapshot").option("partitionBy", "days(ts)")
      .mode("append").save(root)

  test("days(ts): tuples are day ordinals; one file per day") {
    val root = newRoot()
    writeDays(root)
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.partitionSpecs === Seq("days(ts)"))
    assert(snap.partitionCols === Seq("ts"))
    val days = snap.entries.map(e =>
      SnapshotPartition.decodeTuple(e.tuple)("days(ts)").get.toLong).sorted
    assert(days === (0L to 7L))
    val back = spark.read.format("graft-snapshot").load(root)
    assert(back.count() === 8000)
  }

  test("ALIGNED ts range predicates are consumed; unaligned prune but stay residual") {
    val root = newRoot()
    writeDays(root)
    def load() = spark.read.format("graft-snapshot").load(root)
    // aligned: [day2 start, day4 start) — decidable for every file
    val aligned = load().where(
      col("ts") >= timestamp_micros(lit(2 * MicrosPerDay)) &&
        col("ts") < timestamp_micros(lit(4 * MicrosPerDay)))
    val s1 = scanOf(aligned)
    assert(s1.plannedFiles.size === 2, s"planned ${s1.plannedFiles.size}/8")
    assert(filterNodes(aligned).isEmpty,
      s"aligned predicate not consumed:\n${aligned.queryExecution.executedPlan}")
    assert(aligned.count() === 2000)
    // aligned count(*) answers from the manifest
    val counted = load().where(
      col("ts") >= timestamp_micros(lit(2 * MicrosPerDay)) &&
        col("ts") < timestamp_micros(lit(4 * MicrosPerDay))).groupBy().count()
    counted.collect()
    assert(counted.queryExecution.executedPlan.toString.contains("count=")
      || scanCountFound(counted), "expected metadata count scan")
    // unaligned: cuts INSIDE day 2 — day 2's file kept, filter residual
    val unaligned = load().where(
      col("ts") >= timestamp_micros(lit(2 * MicrosPerDay + 500L * 1000000L)))
    val s2 = scanOf(unaligned)
    assert(s2.plannedFiles.size === 6, s"planned ${s2.plannedFiles.size}/8")
    assert(filterNodes(unaligned).nonEmpty, "unaligned predicate must stay residual")
    assert(unaligned.count() === 500 + 5 * 1000)
  }

  private def scanCountFound(df: DataFrame): Boolean =
    (df.queryExecution.executedPlan.collect { case b: BatchScanExec => b.scan } ++
      df.queryExecution.executedPlan.collect {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.collect { case b: BatchScanExec => b.scan }
      }.flatten)
      .exists(_.isInstanceOf[graft.storage.dsv2.SnapshotCountScan])

  test("retention DELETE below an aligned cutoff is metadata-only") {
    val root = newRoot()
    writeDays(root)
    val before = SnapshotTable.latest(spark, root).get.files.toSet
    spark.sql(s"CREATE TABLE tf_ret USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql(s"DELETE FROM tf_ret WHERE ts < " +
        s"timestamp_micros(${3 * MicrosPerDay})")
      val after = SnapshotTable.latest(spark, root).get
      assert(after.files.toSet.subsetOf(before),
        s"retention delete rewrote files: ${after.files.toSet -- before}")
      assert(after.entries.size === 5)
      assert(spark.sql("SELECT count(*) FROM tf_ret").head.getLong(0) === 5000)
    } finally spark.sql("DROP TABLE IF EXISTS tf_ret")
  }

  test("months(d) over DATE via the library path; date predicates prune") {
    val root = newRoot()
    val df = spark.range(180).select(col("id").as("k"),
      date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("id").cast("int")).as("d"))
      .repartition(1) // single task → the dir writer emits one file per month
    SnapshotTable.create(spark, root, df, partitionBy = Seq("months(d)"))
    val snap = SnapshotTable.latest(spark, root).get
    // Jan..Jun 2024 = month ordinals 648..653
    val months = snap.entries.map(e =>
      SnapshotPartition.decodeTuple(e.tuple)("months(d)").get.toLong).sorted
    assert(months === (648L to 653L))
    val mar = spark.read.format("graft-snapshot").load(root)
      .where(col("d") >= lit(java.sql.Date.valueOf("2024-03-01")) &&
        col("d") < lit(java.sql.Date.valueOf("2024-04-01")))
    val s = scanOf(mar)
    assert(s.plannedFiles.size === 1)
    assert(filterNodes(mar).isEmpty, "month-aligned date range should be consumed")
    assert(mar.count() === 31)
  }

  test("hours(ts) prunes hour bands; bucket[8](s) refutes equality") {
    val root = newRoot()
    spark.range(240).select(col("id").as("k"),
      timestamp_micros(expr("id div 10") * 3600000000L + (col("id") % 10) * 60000000L).as("ts"))
      .repartition(1) // transforms take no required distribution; pin layout
      .write.format("graft-snapshot").option("partitionBy", "hours(ts)")
      .mode("append").save(root)
    val h = spark.read.format("graft-snapshot").load(root)
      .where(col("ts") >= timestamp_micros(lit(2L * 3600000000L)) &&
        col("ts") < timestamp_micros(lit(3L * 3600000000L)))
    assert(scanOf(h).plannedFiles.size === 1)
    assert(h.count() === 10)

    val broot = newRoot()
    spark.range(1000).select(col("id").as("k"),
      concat(lit("u"), (col("id") % 100).cast("string")).as("u"))
      .repartition(1)
      .write.format("graft-snapshot").option("partitionBy", "bucket[8](u)")
      .mode("append").save(broot)
    val bsnap = SnapshotTable.latest(spark, broot).get
    assert(bsnap.entries.size === 8)
    val eq = spark.read.format("graft-snapshot").load(broot)
      .where(col("u") === "u42")
    val bs = scanOf(eq)
    assert(bs.plannedFiles.size === 1, s"bucket prune planned ${bs.plannedFiles.size}/8")
    // bucket match proves nothing — the filter must stay residual
    assert(filterNodes(eq).nonEmpty)
    assert(eq.count() === 10)
  }

  test("NULL sources land in the NULL tuple for transformed fields too") {
    val root = newRoot()
    Seq((1L, Some(java.sql.Timestamp.from(java.time.Instant.EPOCH))),
      (2L, None: Option[java.sql.Timestamp]), (3L, None))
      .toDF("k", "ts").repartition(1)
      .write.format("graft-snapshot").option("partitionBy", "days(ts)")
      .mode("append").save(root)
    val isNull = spark.read.format("graft-snapshot").load(root)
      .where(col("ts").isNull)
    assert(scanOf(isNull).plannedFiles.size === 1)
    assert(filterNodes(isNull).isEmpty, "IS NULL is exact on transformed fields")
    assert(isNull.select("k").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("compact on a days table bin-packs whole days and keeps tuples") {
    val root = newRoot()
    writeDays(root)
    writeDays(root.replace("/t", "/ignore")) // keep dirs unique; no-op
    // fragment: three more appends of the same 8 days
    (1 to 3).foreach { _ =>
      spark.range(800).select(col("id").as("k"),
        timestamp_micros(expr("id div 100") * MicrosPerDay).as("ts"))
        .write.format("graft-snapshot").mode("append").save(root)
    }
    assert(SnapshotTable.latest(spark, root).get.entries.size > 8)
    SnapshotTable.compact(spark, root, 4)
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.entries.size === 8) // one file per day again
    snap.entries.foreach(e => assert(e.tuple.nonEmpty))
    assert(spark.read.format("graft-snapshot").load(root).count() === 8000 + 2400)
  }
}
