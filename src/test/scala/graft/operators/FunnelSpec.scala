package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Ordered-funnel semantics on a crafted fixture: order sensitivity, the
  * per-step window clock restarting at each FIRST qualifying time, ties at
  * the boundary, and k > 3 steps. */
class FunnelSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // A=signup, B=activate, C=invite, D=purchase; window = 100 s
  private def fixture = {
    val sq = spark; import sq.implicits._
    Seq(
      // u1 completes all four, each step 50 s after the previous
      (1L, "A", ts(0)), (1L, "B", ts(50)), (1L, "C", ts(100)), (1L, "D", ts(150)),
      // u2 does B BEFORE A: that B must not count; a later B does
      (2L, "B", ts(10)), (2L, "A", ts(20)), (2L, "B", ts(60)),
      // u3's B lands exactly at A+window (inclusive bound); C misses by 1 s
      (3L, "A", ts(0)), (3L, "B", ts(100)), (3L, "C", ts(201)),
      // u4 never starts (only later steps)
      (4L, "B", ts(0)), (4L, "C", ts(10)), (4L, "D", ts(20)),
      // u5: the clock chains from the FIRST qualifying B (t=30), so a C at
      // t=140 is outside [30, 130] even though a second B at t=90 is closer
      (5L, "A", ts(0)), (5L, "B", ts(30)), (5L, "B", ts(90)), (5L, "C", ts(140))
    ).toDF("user_id", "event_type", "ts")
  }

  test("step times: order-sensitive, inclusive window, clock from first qualifying time") {
    val t = Funnel.stepTimes(fixture, "user_id", "event_type", "ts",
      Seq("A", "B", "C", "D"), windowSec = 100)
      .orderBy("user")
      .collect().map(r => (r.getLong(0),
        (1 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Double].toLong))))
      .toMap
    assert(t(1L) == Seq(Some(0L), Some(50L), Some(100L), Some(150L)))
    // u2: pre-A B ignored; the t=60 B qualifies; no C/D
    assert(t(2L) == Seq(Some(20L), Some(60L), None, None))
    // u3: B at exactly A+100 qualifies (inclusive); C at 201 > 100+100 fails
    assert(t(3L) == Seq(Some(0L), Some(100L), None, None))
    // u4 never did step 1: everything null
    assert(t(4L) == Seq(None, None, None, None))
    // u5: C at 140 is outside the window of the FIRST B (30+100)
    assert(t(5L) == Seq(Some(0L), Some(30L), None, None))
  }

  test("summary: per-step counts and adjacent conversion rates") {
    val r = Funnel.summary(fixture, "user_id", "event_type", "ts",
      Seq("A", "B", "C", "D"), windowSec = 100).collect()
    assert(r.length == 1)
    val Row(n1: Long, n2: Long, n3: Long, n4: Long, c12: Double, c23: Double, c34: Double) = r(0)
    assert((n1, n2, n3, n4) == ((4L, 4L, 1L, 1L)))
    assert(c12 == 1.0 && c23 == 0.25 && c34 == 1.0)
  }

  test("zero upstream users yield null conversions, not division errors") {
    val sq = spark; import sq.implicits._
    val df = Seq((1L, "X", ts(0))).toDF("user_id", "event_type", "ts")
    val r = Funnel.summary(df, "user_id", "event_type", "ts",
      Seq("A", "B"), windowSec = 10).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
  }
}
