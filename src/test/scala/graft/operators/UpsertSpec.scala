package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpsertSpec extends SparkSpec {

  test("last-write-wins merge rewrites only the touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert").toString + "/t"
    val base = Seq(
      (1L, "A", 1L, 10.0), (2L, "A", 1L, 20.0), (3L, "A", 1L, 30.0),
      (4L, "B", 1L, 40.0), (5L, "B", 1L, 50.0))
      .toDF("k", "day", "ver", "v")
    base.write.partitionBy("day").parquet(dir)

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes(part: String): Map[String, Long] = {
      val d = new org.apache.hadoop.fs.Path(dir, s"day=$part")
      fs.listStatus(d).filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    }
    val bBefore = mtimes("B")

    // update k=2 (newer), stale update k=3 (older version loses),
    // insert k=6 in A, open a new partition C
    val updates = Seq(
      (2L, "A", 2L, 21.0), (3L, "A", 0L, 99.0),
      (6L, "A", 2L, 60.0), (7L, "C", 2L, 70.0))
      .toDF("k", "day", "ver", "v")
    val affected = Layout.upsertPartitioned(
      spark, dir, updates, Seq("k"), "ver", "day")
    assert(affected === Seq("A", "C"))

    val got = spark.read.parquet(dir)
      .select("k", "day", "ver", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "A", 1L, 10.0), (2L, "A", 2L, 21.0), (3L, "A", 1L, 30.0),
      (4L, "B", 1L, 40.0), (5L, "B", 1L, 50.0),
      (6L, "A", 2L, 60.0), (7L, "C", 2L, 70.0)))

    // partition B: same files, untouched timestamps — no rewrite happened
    assert(mtimes("B") === bBefore)
  }

  test("first write (no existing path) and version ties prefer updates") {
    import spark.implicits._
    val dir = Files.createTempDirectory("upsert").toString + "/fresh"
    val u1 = Seq((1L, "A", 1L, 1.0)).toDF("k", "day", "ver", "v")
    Layout.upsertPartitioned(spark, dir, u1, Seq("k"), "ver", "day")
    // same version as current -> update side wins the tie
    val u2 = Seq((1L, "A", 1L, 2.0)).toDF("k", "day", "ver", "v")
    Layout.upsertPartitioned(spark, dir, u2, Seq("k"), "ver", "day")
    val got = spark.read.parquet(dir).select("v").collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(2.0))
  }
}
