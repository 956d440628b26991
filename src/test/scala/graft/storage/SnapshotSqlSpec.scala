package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The snapshot table's SQL surface through the session catalog: DDL
  * (`CREATE TABLE ... USING graft-snapshot`), reads with pushdown, DML
  * (`INSERT INTO` routes through the connector's BatchWrite as an
  * append), and `REFRESH TABLE` picking up externally-committed
  * versions. */
class SnapshotSqlSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapsql").toString + "/t"
  private var n = 0
  private def newTable(): String = { n += 1; s"snap_sql_spec_$n" }

  test("CREATE TABLE USING graft-snapshot + SELECT + INSERT INTO + REFRESH") {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "s", "v")
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 2)
      assert(spark.sql(s"SELECT s FROM $tbl WHERE k = 2").head.getString(0) === "b")
      // INSERT INTO = connector append: a NEW snapshot version
      spark.sql(s"INSERT INTO $tbl VALUES (3, 'c', 2)")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 3)
      assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
      // an EXTERNAL commit (library API) becomes visible after REFRESH
      SnapshotTable.append(spark, root, Seq((9L, "x", 3L)).toDF("k", "s", "v"))
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 4)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL predicates reach the connector's file pruning") {
    val root = newRoot()
    val tbl = newTable()
    spark.range(8000).select(col("id").as("k"), (col("id") % 97).as("x"), lit(1L).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      val df = spark.sql(s"SELECT sum(k) AS sk FROM $tbl WHERE k BETWEEN 1000 AND 1999")
      assert(df.head.getLong(0) === (1000L to 1999L).sum)
      // the executed plan carries the pruned-file evidence
      val scans = df.queryExecution.executedPlan.toString()
      assert(df.queryExecution.executedPlan.exists(
        _.toString.contains("graft-snapshot")), s"no connector scan in:\n$scans")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("DELETE FROM: group-based copy-on-write, old version time-travels") {
    val root = newRoot()
    val tbl = newTable()
    spark.range(1000).select(col("id").as("k"), (col("id") % 10).as("g"))
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE g = 3")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 900)
      assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE g = 3")
        .head.getLong(0) === 0)
      // DELETE committed a NEW version; the pre-delete rows time-travel
      assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
      assert(spark.read.format("graft-snapshot").option("versionAsOf", 1)
        .load(root).count() === 1000)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("DELETE FROM rewrites ONLY files the condition can touch (stats-pruned groups)") {
    val root = newRoot()
    val tbl = newTable()
    spark.range(8000).select(col("id").as("k"), (col("id") % 7).as("x"))
      .repartitionByRange(8, col("k"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    val before = SnapshotTable.latest(spark, root).get.files
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // touches one 1000-row range file out of 8
      spark.sql(s"DELETE FROM $tbl WHERE k >= 2000 AND k < 2100")
      val after = SnapshotTable.latest(spark, root).get.files
      val retained = before.toSet.intersect(after.toSet)
      assert(retained.size >= 6,
        s"untouched files must be retained verbatim: ${retained.size}/8 kept")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 7900)
      // stats skipping survives the SQL delete (fresh stats on rewrites)
      val st = SnapshotTable.stats(spark, root,
        SnapshotTable.latest(spark, root).get.version)
      assert(after.forall(f => st.contains((SnapshotTable.norm(f), "k"))),
        "every post-delete file must carry k stats")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("UPDATE: SQL row rewrite through the same group-based machinery") {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql(s"UPDATE $tbl SET s = 'X' WHERE k = 2")
      spark.sql(s"REFRESH TABLE $tbl")
      val got = spark.sql(s"SELECT k, s FROM $tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((1L, "a"), (2L, "X"), (3L, "c")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE INTO: literal SQL with UPDATE/DELETE/INSERT arms hits the ACID layer") {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "x")
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    Seq((2L, "B", 200.0), (4L, "DEL", 0.0), (9L, "i", 90.0)).toDF("k", "s", "x")
      .createOrReplaceTempView("merge_src")
    try {
      spark.sql(
        s"""MERGE INTO $tbl t USING merge_src u ON t.k = u.k
           |WHEN MATCHED AND u.s = 'DEL' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql(s"REFRESH TABLE $tbl")
      val got = spark.sql(s"SELECT k, s, x FROM $tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      assert(got === Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0),
        (9L, "i", 90.0)))
      // one MERGE = one new snapshot version; the base still time-travels
      assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
      assert(spark.read.format("graft-snapshot").option("versionAsOf", 1)
        .load(root).count() === 4)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.catalog.dropTempView("merge_src")
    }
  }

  test("METADATA-ONLY DELETE: an aligned predicate drops files without any rewrite") {
    val root = newRoot()
    val tbl = newTable()
    // two appends = two provably-disjoint file sets on k
    spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("x"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    spark.range(1000, 2000).select(col("id").as("k"), (col("id") % 7).as("x"))
      .write.format("graft-snapshot").option("statsCols", "k")
      .mode("append").save(root)
    val before = SnapshotTable.latest(spark, root).get
    val oldFiles = before.files.toSet
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // k < 1000 is exactly the first append's files: metadata delete
      spark.sql(s"DELETE FROM $tbl WHERE k < 1000")
      val after = SnapshotTable.latest(spark, root).get
      assert(after.version === before.version + 1)
      // every surviving file is an ORIGINAL file — nothing was rewritten
      assert(after.files.toSet.subsetOf(oldFiles),
        s"metadata delete must not rewrite: ${after.files.toSet -- oldFiles}")
      assert(after.files.size < before.files.size)
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*), min(k) FROM $tbl").head.toString
        === "[1000,1000]")
      // stats sidecar carried for the kept files (skipping still works)
      assert(SnapshotTable.stats(spark, root, after.version).nonEmpty)
      // a MISALIGNED predicate falls back to the copy-on-write rewrite —
      // still exact, just not metadata-only
      spark.sql(s"DELETE FROM $tbl WHERE k >= 1500 AND k < 1510")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 990)
      // a file with NULLS in the predicate column is never dropped whole
      val root2 = newRoot()
      val tbl2 = newTable()
      spark.range(100).select(
          when(col("id") === 7, lit(null)).otherwise(col("id")).as("k"),
          col("id").as("v"))
        .write.format("graft-snapshot").option("statsCols", "k")
        .mode("append").save(root2)
      spark.sql(s"CREATE TABLE $tbl2 USING `graft-snapshot` OPTIONS (path '$root2')")
      try {
        spark.sql(s"DELETE FROM $tbl2 WHERE k < 200") // covers [min,max] but NOT the null
        spark.sql(s"REFRESH TABLE $tbl2")
        val left = spark.sql(s"SELECT v FROM $tbl2").collect().map(_.getLong(0)).toSeq
        assert(left === Seq(7L), s"null-k row must survive, got $left")
      } finally spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("row-level conflicts: a commit landing mid-operation fails the CAS loudly") {
    val root = newRoot()
    spark.range(100).select(col("id").as("k"), lit("v").as("s"))
      .write.format("graft-snapshot").mode("append").save(root)
    val base = SnapshotTable.latest(spark, root).get // the operation's pin: v1
    // a concurrent writer commits v2 between the operation's resolution
    // and its ReplaceData commit (the race a statement-level re-resolve
    // cannot see)
    SnapshotTable.append(spark, root,
      spark.range(100, 200).select(col("id").as("k"), lit("w").as("s")))
    val write = new graft.storage.dsv2.GroupReplaceDataWrite(
      root, base, spark.read.format("graft-snapshot").load(root).schema,
      () => base.files)
    // the rename CAS on v2 must throw, never clobber the appended rows
    intercept[java.util.ConcurrentModificationException] {
      write.commit(Array.empty)
    }
    assert(spark.read.format("graft-snapshot").load(root).count() === 200)
    assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
  }

  test("METADATA-ONLY DELETE on a TIMESTAMP column: literal micros are rescaled to the stats' seconds") {
    val root = newRoot()
    val tbl = newTable()
    // two appends = disjoint ts ranges; stats record cast(ts as double)
    // = epoch SECONDS, while the pushed V2 literal carries epoch MICROS
    spark.range(100).select(
        timestamp_seconds(lit(1000000L) + col("id")).as("ts"),
        col("id").as("v"))
      .write.format("graft-snapshot").option("statsCols", "ts")
      .mode("append").save(root)
    spark.range(100).select(
        timestamp_seconds(lit(2000000L) + col("id")).as("ts"),
        (col("id") + 100L).as("v"))
      .write.format("graft-snapshot").option("statsCols", "ts")
      .mode("append").save(root)
    val before = SnapshotTable.latest(spark, root).get
    val oldFiles = before.files.toSet
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      // retention cutoff BETWEEN the two appends: a micros-vs-seconds
      // comparison would "prove" EVERY file fully inside (max-seconds ≪
      // cutoff-micros) and drop the whole table — silent mass data loss
      spark.sql(s"DELETE FROM $tbl WHERE ts < timestamp_seconds(1500000)")
      val after = SnapshotTable.latest(spark, root).get
      assert(after.files.nonEmpty, "timestamp retention delete dropped the whole table")
      // ...and the aligned cutoff still takes the METADATA-ONLY path
      assert(after.files.toSet.subsetOf(oldFiles),
        s"metadata delete must not rewrite: ${after.files.toSet -- oldFiles}")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*), min(v) FROM $tbl").head.toString
        === "[100,100]")
      // equality inside a file's [min,max] must fall back to the rewrite
      // and actually delete (the micros bug made it a silent no-op)
      spark.sql(s"DELETE FROM $tbl WHERE ts = timestamp_seconds(2000050)")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head.getLong(0) === 99)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
