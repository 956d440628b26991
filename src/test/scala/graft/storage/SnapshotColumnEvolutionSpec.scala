package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** RENAME / DROP COLUMN evolution over a name-keyed parquet format:
  * metadata-only versions carrying a `#colmap` lineage event. Old files
  * keep their written names; every reader resolves a logical column to
  * each file's PHYSICAL name ([[SnapshotTable.physicalColumn]]), and a
  * re-used name (drop+re-add, or a rename-freed name) is a FRESH column
  * old files never leak into. */
final class SnapshotColumnEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapcolevo").toString + "/t"

  test("RENAME COLUMN: old files serve the renamed column, library + connector + SQL") {
    val root = newRoot()
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
      .write.format("graft-snapshot").option("statsCols", "k,price")
      .mode("append").save(root)
    val v2 = SnapshotTable.renameColumn(spark, root, "price", "amount")
    assert(v2 === 2L)
    // library read: old files serve 'amount' from physical 'price'
    val got = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("k", "amount"))
    assert(got === Seq((1L, 10.0), (2L, 20.0)))
    // connector read agrees (per-file mapped schema inside the reader)
    val cdf = spark.read.format("graft-snapshot").load(root)
    assert(cdf.columns.toSeq === Seq("k", "amount"))
    assert(cdf.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq === got)
    // filters on the renamed column still work (and still PRUNE — the
    // carried stats were re-keyed at the rename)
    assert(cdf.where(col("amount") > 15.0).count() === 1)
    val desc = spark.read.format("graft-snapshot").load(root)
      .where(col("amount") > 1e6).queryExecution.executedPlan.toString
    assert(desc.contains("files=0/"), s"expected stats pruning in:\n$desc")
    // time travel to v1 shows the ORIGINAL name
    assert(spark.read.format("graft-snapshot").option("versionAsOf", 1)
      .load(root).columns.toSeq === Seq("k", "price"))
    // appends after the rename write the new name; both eras agree
    Seq((3L, 30.0)).toDF("k", "amount")
      .write.format("graft-snapshot").mode("append").save(root)
    assert(SnapshotTable.read(spark, root).agg(sum("amount")).head.getDouble(0)
      === 60.0)
  }

  test("rename CHAIN a->b->c composes; freed names become fresh columns") {
    val root = newRoot()
    Seq((1L, "x1"), (2L, "x2")).toDF("k", "a")
      .write.format("graft-snapshot").mode("append").save(root)
    SnapshotTable.renameColumn(spark, root, "a", "b")
    SnapshotTable.renameColumn(spark, root, "b", "c")
    assert(SnapshotTable.read(spark, root).orderBy("k")
      .select("c").collect().map(_.getString(0)).toSeq === Seq("x1", "x2"))
    // re-add a column under the FREED name 'a' (mergeSchema append):
    // old files must NOT leak their physical 'a' into it
    Seq((3L, "x3", 99L)).toDF("k", "c", "a")
      .write.format("graft-snapshot").option("mergeSchema", "true")
      .mode("append").save(root)
    val rows = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    assert(rows === Seq((1L, "x1", null), (2L, "x2", null), (3L, "x3", 99L)))
    // connector agrees
    assert(spark.read.format("graft-snapshot").load(root)
      .where(col("a").isNotNull).count() === 1)
  }

  test("DROP COLUMN hides it; time travel keeps it; re-add is a fresh column") {
    val root = newRoot()
    Seq((1L, "a", 7L), (2L, "b", 8L)).toDF("k", "v", "x")
      .write.format("graft-snapshot").mode("append").save(root)
    val v2 = SnapshotTable.dropColumn(spark, root, "x")
    assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("k", "v"))
    assert(spark.read.format("graft-snapshot").load(root)
      .columns.toSeq === Seq("k", "v"))
    // time travel still shows the dropped column with its data
    val old = spark.read.format("graft-snapshot").option("versionAsOf", v2 - 1)
      .load(root)
    assert(old.columns.toSeq === Seq("k", "v", "x"))
    assert(old.agg(sum("x")).head.getLong(0) === 15L)
    // re-add 'x' as a STRING — the dropped long lineage must not leak
    Seq((3L, "c", "fresh")).toDF("k", "v", "x")
      .write.format("graft-snapshot").option("mergeSchema", "true")
      .mode("append").save(root)
    val rows = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(rows === Seq((1L, "a", null), (2L, "b", null), (3L, "c", "fresh")))
  }

  test("SQL: ALTER TABLE RENAME COLUMN / DROP COLUMN through the catalog") {
    val wh = Files.createTempDirectory("snapcolevo_wh").toString
    spark.conf.set("spark.sql.catalog.gcolevo",
      "graft.storage.dsv2.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gcolevo.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE gcolevo.ns")
      spark.sql("CREATE TABLE gcolevo.ns.t (k BIGINT, price DOUBLE) " +
        "USING `graft-snapshot`")
      spark.sql("INSERT INTO gcolevo.ns.t VALUES (1, 10.0), (2, 20.0)")
      spark.sql("ALTER TABLE gcolevo.ns.t RENAME COLUMN price TO amount")
      assert(spark.sql("SELECT amount FROM gcolevo.ns.t ORDER BY k")
        .collect().map(_.getDouble(0)).toSeq === Seq(10.0, 20.0))
      spark.sql("ALTER TABLE gcolevo.ns.t DROP COLUMN amount")
      assert(spark.sql("SELECT * FROM gcolevo.ns.t").columns.toSeq === Seq("k"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcolevo.ns.t")
      spark.conf.unset("spark.sql.catalog.gcolevo")
      spark.conf.unset("spark.sql.catalog.gcolevo.warehouse")
    }
  }

  test("interplay: rename + merge-on-read DELETE; compaction retires the mapping") {
    val root = newRoot()
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft-snapshot").mode("append").save(root)
    SnapshotTable.renameColumn(spark, root, "v", "val")
    // MoR DELETE on the renamed table: the rewrite scan maps per file
    val tbl = "colevo_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` " +
      s"OPTIONS (path '$root', deleteMode 'merge-on-read')")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE val = 'b'")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(SnapshotTable.read(spark, root).orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "a"), (3L, "c")))
      assert(SnapshotTable.latest(spark, root).get.colEvents.nonEmpty)
      // compaction rewrites under CURRENT names and retires the event
      SnapshotTable.compact(spark, root, targetFiles = 1)
      val snap = SnapshotTable.latest(spark, root).get
      assert(snap.colEvents.isEmpty,
        "compaction must retire #colmap events")
      assert(SnapshotTable.read(spark, root).columns.toSeq === Seq("k", "val"))
      assert(SnapshotTable.read(spark, root).count() === 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("UPDATE (copy-on-write) on a pre-rename file rewrites it under current names") {
    val root = newRoot()
    Seq((1L, 5.0), (2L, 6.0)).toDF("k", "price").coalesce(1)
      .write.format("graft-snapshot").mode("append").save(root)
    SnapshotTable.renameColumn(spark, root, "price", "amount")
    val tbl = "colevo_" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    try {
      spark.sql(s"UPDATE $tbl SET amount = 60.0 WHERE k = 2")
      spark.sql(s"REFRESH TABLE $tbl")
      assert(spark.sql(s"SELECT amount FROM $tbl ORDER BY k")
        .collect().map(_.getDouble(0)).toSeq === Seq(5.0, 60.0))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("guardrails: partition/sort/upsert-key columns refuse; feeds refuse crossing DDL") {
    val root = newRoot()
    Seq((1L, "a", 1L)).toDF("k", "v", "p")
      .write.format("graft-snapshot").option("partitionBy", "p")
      .mode("append").save(root)
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, root, "p", "p2")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, root, "p")
    }
    intercept[IllegalArgumentException] { // existing name
      SnapshotTable.renameColumn(spark, root, "v", "k")
    }
    // change feeds refuse windows that cross the DDL version...
    val root2 = newRoot()
    Seq((1L, "a")).toDF("k", "v")
      .write.format("graft-snapshot").mode("append").save(root2)
    val dv = SnapshotTable.renameColumn(spark, root2, "v", "w")
    Seq((2L, "b")).toDF("k", "w")
      .write.format("graft-snapshot").mode("append").save(root2)
    val ex = intercept[UnsupportedOperationException] {
      SnapshotTable.changeFeed(spark, root2, 0L).collect()
    }
    assert(ex.getMessage.contains("rename"))
    // ...but a window strictly AFTER it works
    assert(SnapshotTable.changeFeed(spark, root2, dv)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === Set((2L, "insert")))
  }
}
