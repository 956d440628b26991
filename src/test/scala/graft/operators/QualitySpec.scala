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

  test("profile rejects unknown columns") {
    tables()
    intercept[IllegalArgumentException] {
      Quality.profile(spark.table("orders"), Seq("nope"), Nil)
    }
  }
}
