package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-partitioned joins: two snapshot tables identity-partitioned
  * on the same column report KeyGroupedPartitioning, so a join on that
  * column plans with NO shuffle on either side — the "minimize
  * shuffles" contract at its strongest (at 100 TB the elided exchange
  * IS the query cost). Gated on spark.sql.sources.v2.bucketing.enabled
  * because tuple-grouped planning trades read parallelism for
  * alignment. */
class SnapshotSpjSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapspj").toString + "/t"

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    val top = df.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    val aqe = df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: ShuffleExchangeExec => s }
    }.flatten
    (top ++ aqe).size
  }

  private def writeTable(root: String, rows: Long, tag: String): Unit =
    spark.range(rows).select(col("id").as("k"),
      (col("id") % 8).cast("string").as("g"),
      concat(lit(tag), col("id").cast("string")).as("v"))
      .write.format("graft-snapshot").option("partitionBy", "g")
      .mode("append").save(root)

  test("a co-partitioned equi-join on the partition column plans WITHOUT shuffles") {
    val (rootA, rootB) = (newRoot(), newRoot())
    writeTable(rootA, 4000, "a")
    writeTable(rootB, 2000, "b")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val a = spark.read.format("graft-snapshot").load(rootA)
      val b = spark.read.format("graft-snapshot").load(rootB)
      val joined = a.groupBy("g").agg(count(lit(1)).as("na"))
        .join(b.groupBy("g").agg(count(lit(1)).as("nb")), "g")
        .orderBy("g")
      // group-by on the partition key needs no exchange either; the
      // only shuffle allowed is the final orderBy's range exchange
      assert(shuffles(joined) <= 1,
        s"expected SPJ to elide join shuffles:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === (0 to 7).map(i => (i.toString, 500L, 250L)))
    }
  }

  test("row-level SPJ join returns exactly the co-located pairs") {
    val (rootA, rootB) = (newRoot(), newRoot())
    writeTable(rootA, 800, "a")
    writeTable(rootB, 800, "b")
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false",
      // the ka = kb conjunct joins the key set, so join keys ⊋ partition
      // keys — allow co-partition on the partition-key subset
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val a = spark.read.format("graft-snapshot").load(rootA)
        .select(col("g"), col("k").as("ka"))
      val b = spark.read.format("graft-snapshot").load(rootB)
        .select(col("g"), col("k").as("kb"))
      val joined = a.join(b, Seq("g")).where(col("ka") === col("kb"))
      assert(shuffles(joined) === 0,
        s"expected zero shuffles:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 800)
    }
  }

  test("multi-file partitions read whole through the concatenating reader (row + columnar)") {
    val root = newRoot()
    writeTable(root, 1000, "a")
    writeTable(root, 1000, "b") // second append: every partition now has 2 files
    assert(SnapshotTable.latest(spark, root).get.entries.size === 16)
    withSQLConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      val df = spark.read.format("graft-snapshot").load(root)
      df.collect() // plan with grouping on
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.head.inputRDD.getNumPartitions === 8,
        "grouped: one input partition per tuple, two files each")
      // columnar path through ConcatReader
      assert(df.count() === 2000)
      assert(df.agg(sum("k")).head.getLong(0) === 2 * (0L until 1000L).sum)
      // row path through ConcatReader (force with columnar=false)
      val rowDf = spark.read.format("graft-snapshot")
        .option("columnar", "false").load(root)
      assert(rowDf.count() === 2000)
      assert(rowDf.groupBy("g").count().collect().map(_.getLong(1)).toSet === Set(250L))
    }
  }

  test("without the bucketing conf the scan stays per-file (full parallelism)") {
    val root = newRoot()
    writeTable(root, 4000, "a")
    val df = spark.read.format("graft-snapshot").load(root)
    df.collect()
    // default path: one input partition per FILE, unknown partitioning
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    } ++ df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }
    }.flatten
    assert(scans.head.inputRDD.getNumPartitions === 8)
  }

  /** Minimal withSQLConf (SparkSpec has no SQLHelper). */
  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
