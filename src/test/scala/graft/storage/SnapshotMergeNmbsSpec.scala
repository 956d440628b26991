package graft.storage

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MERGE `WHEN NOT MATCHED BY SOURCE` — the standard CDC-mirror idiom
  * (one statement: update changed keys, insert new keys, DELETE keys
  * that vanished from the source). Spark's `RewriteMergeIntoTable`
  * plans the NMBS arms over our row-level machinery: group-based
  * copy-on-write rewrites the touched files, the delta (merge-on-read)
  * path commits position deletes for the source-absent rows. */
final class SnapshotMergeNmbsSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snapnmbs").toString + "/t"
  private def newTable() = "nmbs_" +
    java.util.UUID.randomUUID().toString.replace("-", "").take(10)

  private val mirrorSql = (tbl: String) =>
    s"""MERGE INTO $tbl t USING nmbs_src u ON t.k = u.k
       |WHEN MATCHED AND t.v <> u.v THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *
       |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin

  private def runMirror(mode: Option[String]): Unit = {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .write.format("graft-snapshot").mode("append").save(root)
    val opts = mode.map(m => s", mergeMode '$m'").getOrElse("")
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` " +
      s"OPTIONS (path '$root'$opts)")
    // the mirror source: key 2 changed, key 5 new, keys 1/4 vanished,
    // key 3 unchanged (matched, no-op arm)
    Seq((2L, "B"), (3L, "c"), (5L, "e")).toDF("k", "v")
      .createOrReplaceTempView("nmbs_src")
    try {
      spark.sql(mirrorSql(tbl))
      spark.sql(s"REFRESH TABLE $tbl")
      val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((2L, "B"), (3L, "c"), (5L, "e")))
      // one statement = one version; the base still time-travels
      assert(SnapshotTable.versions(spark, root) === Seq(1L, 2L))
      assert(spark.read.format("graft-snapshot").option("versionAsOf", 1)
        .load(root).count() === 4)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.catalog.dropTempView("nmbs_src")
    }
  }

  test("NMBS mirror MERGE, copy-on-write") { runMirror(None) }

  test("NMBS mirror MERGE, merge-on-read commits vectors — no rewrite of source-absent files") {
    val root = newRoot()
    val tbl = newTable()
    // file 1 keeps a surviving row (key 3, matched-unchanged) → it must
    // survive VERBATIM with a deletion vector; file 2's rows all vanish
    // from the source → a FULL metadata-only drop (#removed), zero
    // rewrite either way
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v").coalesce(1)
      .write.format("graft-snapshot").mode("append").save(root)
    Seq((10L, "x"), (11L, "y")).toDF("k", "v").coalesce(1)
      .write.format("graft-snapshot").mode("append").save(root)
    val before = SnapshotTable.latest(spark, root).get
    val file1 = before.entries.minBy(_.addV).path
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` " +
      s"OPTIONS (path '$root', mergeMode 'merge-on-read')")
    Seq((1L, "A"), (3L, "c"), (7L, "g")).toDF("k", "v")
      .createOrReplaceTempView("nmbs_src")
    try {
      spark.sql(mirrorSql(tbl))
      spark.sql(s"REFRESH TABLE $tbl")
      val got = spark.sql(s"SELECT k, v FROM $tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((1L, "A"), (3L, "c"), (7L, "g")))
      val after = SnapshotTable.latest(spark, root).get
      val f1After = after.entries.find(_.path == file1)
      assert(f1After.exists(_.dv.nonEmpty),
        "the partially-surviving base file must stay, vector-retired")
      // the change feed types the NMBS arms: deletes for vanished keys
      // (both the DV'd and the fully-removed file), an update pre/post
      // pair for the changed key, inserts for new keys
      val feed = SnapshotTable.changeFeed(spark, root, before.version)
        .select("k", "_change_type").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(feed === Set(
        (1L, "update_preimage"), (1L, "update_postimage"),
        (7L, "insert"),
        (2L, "delete"), (10L, "delete"), (11L, "delete")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.catalog.dropTempView("nmbs_src")
    }
  }

  test("NMBS UPDATE arm: source-absent rows can be tombstoned instead of deleted") {
    val root = newRoot()
    val tbl = newTable()
    Seq((1L, "a", false), (2L, "b", false)).toDF("k", "v", "gone")
      .write.format("graft-snapshot").mode("append").save(root)
    spark.sql(s"CREATE TABLE $tbl USING `graft-snapshot` OPTIONS (path '$root')")
    Seq((1L, "A")).toDF("k", "v").createOrReplaceTempView("nmbs_src")
    try {
      spark.sql(
        s"""MERGE INTO $tbl t USING nmbs_src u ON t.k = u.k
           |WHEN MATCHED THEN UPDATE SET v = u.v
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET gone = true""".stripMargin)
      spark.sql(s"REFRESH TABLE $tbl")
      val got = spark.sql(s"SELECT k, v, gone FROM $tbl ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
      assert(got === Seq((1L, "A", false), (2L, "b", true)))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.catalog.dropTempView("nmbs_src")
    }
  }
}
