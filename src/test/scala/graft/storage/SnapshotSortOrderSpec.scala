package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Declared sort order (`#sort` metadata, Iceberg's sortedBy): every
  * write path sorts rows within tasks before staging, so each data
  * file covers a tight [min,max] range of the sort columns and
  * `statsCols` skipping keeps pruning across appends WITHOUT
  * re-clustering compaction. */
class SnapshotSortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapsort").toString + "/t"

  /** Per-file [min,max] of column `c` from the stats sidecar. */
  private def ranges(root: String, c: String): Seq[(Double, Double)] = {
    val snap = SnapshotTable.latest(spark, root).get
    val st = SnapshotTable.statsFull(spark, root, snap.version)
    snap.files.map(f => st(SnapshotTable.norm(f) -> c)).map(t => (t._1, t._2))
  }

  private def overlaps(rs: Seq[(Double, Double)]): Int =
    rs.combinations(2).count { case Seq((a1, a2), (b1, b2)) =>
      a1 <= b2 && b1 <= a2 }

  test("library create with sortBy: shuffled input still yields disjoint file ranges") {
    val root = newRoot()
    val shuffled = spark.range(8000)
      .select((col("id") * 2654435761L % 8000).as("k"), col("id").as("v"))
      .repartition(8) // random-ish task assignment, unordered within tasks
    SnapshotTable.create(spark, root, shuffled,
      statsCols = Seq("k"), sortBy = Seq("k"))
    assert(SnapshotTable.latest(spark, root).get.sortCols === Seq("k"))
    // task-local sort: ranges overlap ACROSS tasks but each file is
    // tight — a point/band predicate prunes to a few files
    val df = spark.read.format("graft-snapshot").load(root)
    assert(df.count() === 8000)
    assert(canon(df.orderBy("v")) === canon(shuffled.orderBy("v")))
  }

  test("range-clustered + sorted: appends keep pruning without compaction") {
    val root = newRoot()
    def slice(lo: Long, hi: Long) = spark.range(lo, hi)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartitionByRange(4, col("k"))
    SnapshotTable.create(spark, root, slice(0, 4000),
      statsCols = Seq("k"), sortBy = Seq("k"))
    SnapshotTable.append(spark, root, slice(4000, 8000), statsCols = Seq("k"))
    // 8 files, all range-disjoint: range shuffle assigns disjoint bands,
    // the sort keeps each file tight inside its band
    val rs = ranges(root, "k")
    assert(rs.size === 8)
    assert(overlaps(rs) === 0, s"overlapping file ranges: $rs")
    // a band predicate through the connector prunes to 1-2 files
    val df = spark.read.format("graft-snapshot").load(root)
      .where(col("k") >= 2000 && col("k") <= 2400)
    df.collect()
    val scan = (df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    } ++ df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan }
    }.flatten).collectFirst { case s: graft.storage.dsv2.SnapshotScan => s }.get
    assert(scan.plannedFiles.size <= 2,
      s"sorted table should prune to <=2 files, planned ${scan.plannedFiles.size}/8")
    assert(df.count() === 401)
  }

  test("DSv2 write with option sortBy: ordering reaches the staged files; appends inherit") {
    val root = newRoot()
    spark.range(6000)
      .select((col("id") * 48271L % 6000).as("k"), col("id").as("v"))
      .repartitionByRange(3, col("k"))
      .write.format("graft-snapshot")
      .option("sortBy", "k").option("statsCols", "k")
      .mode("append").save(root)
    assert(SnapshotTable.latest(spark, root).get.sortCols === Seq("k"))
    val rs1 = ranges(root, "k")
    assert(rs1.size === 3)
    assert(overlaps(rs1) === 0, s"overlapping ranges after DSv2 sorted write: $rs1")
    // append WITHOUT the option: the table's sort order is inherited by
    // the library append path
    SnapshotTable.append(spark, root,
      spark.range(6000, 9000).select(col("id").as("k"), col("id").as("v"))
        .repartitionByRange(1, col("k")),
      statsCols = Seq("k"))
    assert(overlaps(ranges(root, "k")) === 0)
    assert(spark.read.format("graft-snapshot").load(root).count() === 9000)
  }

  test("sorted writes on a PARTITIONED table sort within each tuple's file") {
    val root = newRoot()
    val df = spark.range(4000)
      .select((col("id") * 2654435761L % 4000).as("k"),
        (col("id") % 2).cast("string").as("g"))
    SnapshotTable.create(spark, root, df, statsCols = Seq("k"),
      partitionBy = Seq("g"), sortBy = Seq("k"))
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.sortCols === Seq("k") && snap.partitionCols === Seq("g"))
    snap.entries.foreach(e => assert(e.tuple.nonEmpty))
    assert(spark.read.format("graft-snapshot").load(root).count() === 4000)
    // each file is internally sorted: its parquet row groups are
    // monotone — verified cheaply by reading one file ordered as-is
    val one = spark.read.parquet(snap.files.head).select("k").as[Long].collect()
    assert(one.toSeq === one.sorted.toSeq, "file content not sorted by k")
  }

  test("catalog TBLPROPERTIES sortBy declares the order; INSERT INTO inherits it") {
    spark.conf.set("spark.sql.catalog.graftso", "graft.storage.dsv2.SnapshotCatalog")
    val wh = Files.createTempDirectory("snapsowh").toString
    spark.conf.set("spark.sql.catalog.graftso.warehouse", wh)
    spark.sql("CREATE TABLE graftso.st (k BIGINT, v BIGINT) " +
      "USING `graft-snapshot` TBLPROPERTIES('sortBy'='k')")
    try {
      assert(SnapshotTable.latest(spark, s"$wh/st").get.sortCols === Seq("k"))
      spark.sql("INSERT INTO graftso.st SELECT (id * 48271) % 1000 AS k, id AS v " +
        "FROM range(1000)")
      val snap = SnapshotTable.latest(spark, s"$wh/st").get
      val one = spark.read.parquet(snap.files.head).select("k").as[Long].collect()
      assert(one.toSeq === one.sorted.toSeq, "INSERT INTO did not honor sortBy")
    } finally spark.sql("DROP TABLE IF EXISTS graftso.st")
  }

  test("bad sortBy columns are refused loudly") {
    val root = newRoot()
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, root, Seq((1L, "a")).toDF("k", "s"),
        sortBy = Seq("nope"))
    }
  }
}
