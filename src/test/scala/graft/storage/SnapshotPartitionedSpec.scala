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
