package graft.storage

import java.nio.file.Files
import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The partitioned-table write paths: every staged file must carry an
  * EXACT single-value tuple in the manifest, through create, append,
  * merge (copy-on-write rewrite), and compact — and the tuple wire
  * format must survive Spark's Hive-escaped directory names for hostile
  * values and SQL NULL. */
class SnapshotPartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def newRoot() = Files.createTempDirectory("snappart").toString + "/t"

  private def entries(root: String) =
    SnapshotTable.latest(spark, root).get.entries

  /** Every entry carries a tuple naming exactly `cols`. */
  private def assertTuplePure(root: String, cols: Seq[String]): Unit =
    entries(root).foreach { e =>
      assert(e.tuple.nonEmpty, s"tuple-less entry ${e.path}")
      val t = SnapshotPartition.decodeTuple(e.tuple)
      assert(t.keySet === cols.toSet, s"tuple $t of ${e.path}")
    }

  test("create with partitionBy records exact tuples; data keeps all columns") {
    val root = newRoot()
    val df = Seq((1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0),
      (4L, "C", 40.0)).toDF("k", "flag", "x")
    SnapshotTable.create(spark, root, df, partitionBy = Seq("flag"))
    val snap = SnapshotTable.latest(spark, root).get
    assert(snap.partitionCols === Seq("flag"))
    assertTuplePure(root, Seq("flag"))
    // one file per tuple value, three distinct tuples
    val tuples = entries(root).map(e =>
      SnapshotPartition.decodeTuple(e.tuple)("flag")).toSet
    assert(tuples === Set(Some("A"), Some("B"), Some("C")))
    // data files keep the partition column itself (Iceberg shape)
    val back = SnapshotTable.read(spark, root)
    assert(back.columns.sorted.toSeq === Seq("flag", "k", "x"))
    assert(canon(back.orderBy("k")) === canon(df.orderBy("k")))
    // row counts recorded per file are consistent with the tuple split
    assert(entries(root).map(_.rows).sum === 4L)
  }

  test("partition NULLs and hostile values round-trip the directory encoding") {
    val root = newRoot()
    val df = Seq(
      (1L, Some("a=b/c%d e")), // every escape-relevant char
      (2L, Some("__HIVE_DEFAULT_PARTITION__")), // the literal token as DATA
      (3L, None: Option[String]),
      (4L, Some("%00")), // the tuple NULL token as DATA
      (5L, Some(""))) // Spark writes empty strings as its null dir token
      .toDF("k", "tag")
    SnapshotTable.create(spark, root, df, partitionBy = Seq("tag"))
    val vals = entries(root).map(e =>
      SnapshotPartition.decodeTuple(e.tuple)("tag")).toSet
    assert(vals === Set(Some("a=b/c%d e"),
      Some("__HIVE_DEFAULT_PARTITION__"), None, Some("%00"), Some("")))
    assert(canon(SnapshotTable.read(spark, root).orderBy("k")) ===
      canon(df.orderBy("k")))
  }

  test("append and merge keep files tuple-pure; date partition columns work") {
    val root = newRoot()
    val d1 = Date.valueOf("2024-01-01"); val d2 = Date.valueOf("2024-01-02")
    val base = Seq((1L, d1, 1L), (2L, d2, 1L)).toDF("k", "day", "v")
    SnapshotTable.create(spark, root, base, partitionBy = Seq("day"))
    SnapshotTable.append(spark, root,
      Seq((3L, d1, 1L)).toDF("k", "day", "v"))
    assertTuplePure(root, Seq("day"))
    assert(entries(root).map(e =>
      SnapshotPartition.decodeTuple(e.tuple)("day")).toSet ===
      Set(Some("2024-01-01"), Some("2024-01-02")))
    // copy-on-write merge rewrites everything, re-deriving tuples
    SnapshotTable.merge(spark, root,
      Seq((2L, d2, 2L), (4L, d2, 2L)).toDF("k", "day", "v"), Seq("k"), "v")
    assertTuplePure(root, Seq("day"))
    val got = SnapshotTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSeq
    assert(got === Seq((1L, "2024-01-01", 1L), (2L, "2024-01-02", 2L),
      (3L, "2024-01-01", 1L), (4L, "2024-01-02", 2L)))
  }

  test("partitioned compact collapses per-tuple file sets, refuses clusterBy") {
    val root = newRoot()
    val df = (1L to 40L).map(i => (i, (i % 4).toString)).toDF("k", "g")
    SnapshotTable.create(spark, root, df, partitionBy = Seq("g"))
    // several appends fragment each tuple across files
    SnapshotTable.append(spark, root,
      (41L to 60L).map(i => (i, (i % 4).toString)).toDF("k", "g"))
    SnapshotTable.append(spark, root,
      (61L to 80L).map(i => (i, (i % 4).toString)).toDF("k", "g"))
    val before = entries(root).size
    assert(before > 4)
    intercept[IllegalArgumentException] {
      SnapshotTable.compact(spark, root, 2, clusterBy = Some("k"))
    }
    SnapshotTable.compact(spark, root, 2)
    assertTuplePure(root, Seq("g"))
    // one file per tuple (4 tuples hash over 2 tasks; each task writes
    // one file per tuple it holds)
    assert(entries(root).size === 4)
    assert(SnapshotTable.read(spark, root).count() === 80L)
    assert(SnapshotTable.read(spark, root).agg(sum("k")).head.getLong(0) ===
      (1L to 80L).sum)
  }

  test("merge with partition sources in the key is PARTITION-SCOPED: untouched files retained") {
    val root = newRoot()
    val base = (1L to 80L).map(i => (i, (i % 8).toString, 1L)).toDF("k", "g", "v")
    SnapshotTable.create(spark, root, base, partitionBy = Seq("g"))
    val before = entries(root).map(e => e.tuple -> e.path).toMap
    assert(before.size === 8)
    // the key is (k, g) ⊇ partition source g — updates touch ONLY g=3
    val upd = Seq((3L, "3", 2L), (203L, "3", 2L)).toDF("k", "g", "v")
    SnapshotTable.merge(spark, root, upd, Seq("k", "g"), "v")
    val after = entries(root).map(e => e.tuple -> e.path).toMap
    // 7 of 8 files are the ORIGINALS; only g=3 was rewritten
    val gKey = (t: String) => SnapshotPartition.decodeTuple(t)("g").get
    after.foreach { case (t, p) =>
      if (gKey(t) != "3") assert(before(t) === p, s"retained file rewritten: $t")
      else assert(before(t) !== p, "affected partition not rewritten")
    }
    val got = SnapshotTable.read(spark, root)
    assert(got.count() === 81)
    assert(got.where(col("k") === 3).select("v").head.getLong(0) === 2L)
    assert(got.where(col("k") === 203).count() === 1)
    // tombstones stay scoped too
    SnapshotTable.merge(spark, root,
      Seq((203L, "3", 3L, true)).toDF("k", "g", "v", "del"),
      Seq("k", "g"), "v", deleteCol = Some("del"))
    assert(SnapshotTable.read(spark, root).count() === 80)
    assert(entries(root).count(e => gKey(e.tuple) != "3") === 7)
    // time travel still shows the pre-merge content
    assert(SnapshotTable.readVersion(spark, root, 1L).count() === 80)
  }

  test("merge WITHOUT partition sources in the key falls back to the full rewrite") {
    val root = newRoot()
    val base = (1L to 40L).map(i => (i, (i % 4).toString, 1L)).toDF("k", "g", "v")
    SnapshotTable.create(spark, root, base, partitionBy = Seq("g"))
    val before = entries(root).map(_.path).toSet
    // key (k) does NOT determine g: a key could move partitions — the
    // scoped path must refuse and rewrite everything
    SnapshotTable.merge(spark, root,
      Seq((3L, "0", 2L)).toDF("k", "g", "v"), Seq("k"), "v")
    val after = entries(root).map(_.path).toSet
    assert(after.intersect(before).isEmpty, "full rewrite expected")
    val got = SnapshotTable.read(spark, root)
    assert(got.count() === 40)
    // the moved row landed in its NEW partition's tuple-pure file
    assert(got.where(col("k") === 3).select("g").head.getString(0) === "0")
    assertTuplePure(root, Seq("g"))
  }

  test("unsupported partition column types and absent columns are refused") {
    val root = newRoot()
    val df = Seq((1L, Array(1.0, 2.0))).toDF("k", "emb")
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, root, df, partitionBy = Seq("emb"))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.create(spark, root, df, partitionBy = Seq("nope"))
    }
  }
}
