package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile computes null/nonnull/distinct/min/max per column in one pass") {
    val df = Seq(
      (Option(1L), Option(2.5), Option("a")),
      (Option(1L), Option(4.5), Option.empty[String]),
      (Option(3L), Option.empty[Double], Option("b")),
      (Option.empty[Long], Option(2.5), Option("b"))
    ).toDF("k", "v", "s")
    val rows = Quality.profile(df, Seq("k", "v"), Seq("s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)))).toSeq
    assert(rows === Seq(
      ("k", 4L, 3L, 2L, Some(1.0), Some(3.0)),
      ("s", 4L, 3L, 2L, None, None),
      ("v", 4L, 3L, 2L, Some(2.5), Some(4.5))))
  }

  test("profile is a single aggregate scan (no per-column union of scans)") {
    tables()
    val plan = Quality.profile(spark.table("orders"),
      Seq("o_custkey", "o_totalprice"), Seq("o_orderstatus")).queryExecution
      .executedPlan.toString
    // the UNION contract shape would show one FileScan per column
    assert("FileScan|BatchScan".r.findAllIn(plan).size <= 1,
      s"expected at most one scan, got:\n$plan")
  }

  test("approx profile drops the Expand and stays within HLL++ error") {
    tables()
    val exact = Quality.profile(spark.table("orders"),
      Seq("o_custkey"), Nil).collect()(0)
    val approxDf = Quality.profile(spark.table("orders"),
      Seq("o_custkey"), Nil, approxDistinct = true)
    assert(!approxDf.queryExecution.executedPlan.toString.contains("Expand"),
      "approx mode must not Expand the scan")
    val approx = approxDf.collect()(0)
    val (e, a) = (exact.getLong(3).toDouble, approx.getLong(3).toDouble)
    assert(math.abs(a - e) / e < 0.1, s"approx distinct $a vs exact $e")
    assert(approx.getLong(1) === exact.getLong(1))
  }

  test("checks API counts planted violations per rule") {
    val child = Seq((1L, Option(5.0), "F"), (1L, Option(-2.0), "X"),
      (2L, Option.empty[Double], "O"), (9L, Option(1.0), "F"))
      .toDF("k", "v", "st")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rows = Quality.report(Seq(
        Quality.unique("u", child, Seq("k")),
        Quality.fkExists("fk", child, "k", parent, "pk"),
        Quality.satisfies("pos", child, col("v") > 0),
        Quality.notNull("nn", child, "v"),
        Quality.inSet("enum", child, "st", Seq("F", "O"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows === Seq(
      ("enum", 1L, false), // 'X'
      ("fk", 1L, false),   // k=9 has no parent
      ("nn", 1L, false),   // one null v
      ("pos", 1L, false),  // -2.0 (the null row is three-valued, not a failure)
      ("u", 1L, false)))   // k=1 twice -> one extra row
  }

  test("checks report is all-ok on a clean frame") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val rows = Quality.report(Seq(
        Quality.unique("u", df, Seq("k")),
        Quality.satisfies("pos", df, col("v") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows === Seq(("pos", 0L, true), ("u", 0L, true)))
  }

  test("profile rejects unknown columns") {
    tables()
    intercept[IllegalArgumentException] {
      Quality.profile(spark.table("orders"), Seq("nope"), Nil)
    }
  }

  test("skewReport never truncates keys longer than the pad width") {
    // lpad truncates: distinct 7-digit keys must NOT merge into one
    // 6-char bogus hot key
    val df = Seq.fill(10)(1234567L).map(Tuple1(_)).toDF("k")
      .union(Seq.fill(10)(1239999L).map(Tuple1(_)).toDF("k"))
      .union(Seq.fill(3)(42L).map(Tuple1(_)).toDF("k"))
    val rows = Quality.skewReport(df, "k", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("1234567", 10L), ("1239999", 10L), ("000042", 3L)))
  }
}
