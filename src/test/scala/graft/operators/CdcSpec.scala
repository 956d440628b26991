package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies inserts, deletes, updates and names changed columns") {
    val a = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "st", "tp")
    val b = Seq((2L, "B", 20.0), (3L, "X", 30.0), (4L, "D", 41.0), (5L, "E", 50.0))
      .toDF("k", "st", "tp")
    val d = Cdc.snapshotDiff(a, b, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(d.toSeq === Seq(
      (1L, "delete", ""), (3L, "update", "st"), (4L, "update", "tp"),
      (5L, "insert", "")))
  }

  test("snapshotDiff drops unchanged rows and compares null-safely") {
    val a = Seq((1L, Option("A")), (2L, Option.empty[String]), (3L, Option("C")))
      .toDF("k", "st")
    val b = Seq((1L, Option("A")), (2L, Option("B")), (3L, Option.empty[String]))
      .toDF("k", "st")
    val d = Cdc.snapshotDiff(a, b, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // row 1 unchanged → absent; null→B and C→null are both 'st' updates
    assert(d.toSeq === Seq((2L, "update", "st"), (3L, "update", "st")))
  }

  test("snapshotDiff supports composite keys") {
    val a = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val b = Seq((1L, "x", 9.0), (2L, "y", 2.0)).toDF("k1", "k2", "v")
    val d = Cdc.snapshotDiff(a, b, Seq("k1", "k2")).orderBy("k1", "k2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(d.toSeq === Seq((1L, "x", "update"), (1L, "y", "delete"), (2L, "y", "insert")))
  }

  test("scd2 collapses no-op changes, applies last-write-wins, marks current") {
    // key u1: state A at t1 (two writes, id 2 wins: A), A again at t2 (no-op,
    // collapsed), B at t3 → two versions; u2: single version
    val log = Seq(
      ("u1", 1L, 1L, "Z"), ("u1", 1L, 2L, "A"),
      ("u1", 2L, 3L, "A"),
      ("u1", 3L, 4L, "B"),
      ("u2", 5L, 5L, "Q")).toDF("k", "t", "id", "st")
    val out = Cdc.scd2(log, "k", "t", "id", Seq("st")).orderBy("k", "valid_from")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getString(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("u1", 1L, Some(3L), "A", false),
      ("u1", 3L, None, "B", true),
      ("u2", 5L, None, "Q", true)))
  }

  test("scd2 round-trips with snapshotDiff: as-of reconstruction matches the log head") {
    tables()
    val log = spark.table("events").where(col("user_id") < 10)
      .select(col("user_id"), col("ts").cast("long").as("et"), col("event_id"),
        floor(col("value") / 100).cast("int").as("state"))
    val hist = Cdc.scd2(log, "user_id", "et", "event_id", Seq("state"))
    // exactly one current row per key, and intervals are disjoint/ordered
    val cur = hist.where(col("is_current")).groupBy("user_id").count()
      .where(col("count") =!= 1).count()
    assert(cur === 0)
    val bad = hist.where(col("valid_to").isNotNull && col("valid_to") <= col("valid_from")).count()
    assert(bad === 0)
  }
}
