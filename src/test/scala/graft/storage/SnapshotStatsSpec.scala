package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** NDV statistics: per-file theta sketches in the stats sidecar feed
  * `estimateStatistics` (exact live row counts + per-column
  * distinct/null counts), so the cost-based optimizer sees real
  * cardinalities through the connector. */
class SnapshotStatsSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapstats").toString + "/t"

  test("sidecar lines carry NDV sketches; union estimates survive carry-forward") {
    val root = newRoot()
    spark.range(20000).select(col("id").as("k"), (col("id") % 40).as("x"))
      .coalesce(4)
      .write.format("graft-snapshot").option("statsCols", "x")
      .mode("append").save(root)
    val raw = SnapshotTable.statsRaw(spark, root, 1L)
    assert(raw.nonEmpty && raw.forall(_.ndv.isDefined), s"sketchless lines: $raw")
    val est = SnapshotTable.ndvUnion(raw.flatMap(_.ndv)).get
    assert(math.abs(est - 40L) <= 4, s"NDV(x)=40, estimated $est")
    // an APPEND carries the old lines (sketches included) forward
    spark.range(20000, 40000).select(col("id").as("k"), (col("id") % 40).as("x"))
      .coalesce(4)
      .write.format("graft-snapshot").option("statsCols", "x")
      .mode("append").save(root)
    val raw2 = SnapshotTable.statsRaw(spark, root, 2L)
    assert(raw2.size === 8 && raw2.forall(_.ndv.isDefined))
    assert(math.abs(SnapshotTable.ndvUnion(raw2.flatMap(_.ndv)).get - 40L) <= 4)
  }

  test("NDV sketches flip a selective join to broadcast that scan bytes alone would not") {
    val factRoot = newRoot()
    val dimDir = Files.createTempDirectory("snapdim").toString + "/d"
    // FACT: ~15 MB of parquet, x has NDV 40 spread across every file (no
    // file pruning on x = 7 — the byte estimate stays big)
    spark.range(400000).select(col("id").as("k"), (col("id") % 40).as("x"),
        sha2(col("id").cast("string"), 256).as("pad"))
      .coalesce(4)
      .write.format("graft-snapshot").option("statsCols", "x")
      .mode("append").save(factRoot)
    // DIM: plain parquet, ~3 MB — above the lowered broadcast threshold
    spark.range(400000).select(col("id").as("k"),
        sha2(col("id").cast("string"), 512).as("payload"))
      .coalesce(2).write.parquet(dimDir)

    def planOf(cbo: Boolean): String = {
      spark.conf.set("spark.sql.cbo.enabled", cbo.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (1024 * 1024).toString)
      try {
        val fact = spark.read.format("graft-snapshot").load(factRoot)
        val dim = spark.read.parquet(dimDir)
        val j = fact.where(col("x") === 7).join(dim, "k")
          .agg(count(lit(1)).as("n"))
        assert(j.head.getLong(0) === 10000L) // correctness either way
        j.queryExecution.executedPlan.toString()
      } finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    val without = planOf(cbo = false)
    assert(without.contains("SortMergeJoin") && !without.contains("BroadcastHashJoin"),
      s"without CBO the 15MB scan must sort-merge:\n$without")
    val withCbo = planOf(cbo = true)
    assert(withCbo.contains("BroadcastHashJoin"),
      s"CBO + NDV(x)=40 must estimate rows/40 and broadcast the filtered side:\n$withCbo")
  }
}
