package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AsOfJoin.lastBeforeWith: payload carry, deterministic ties, tolerance. */
class AsOfJoinSpec extends SparkSpec {

  private def fx = {
    val sq = spark
    import sq.implicits._
    // clicks (user, ts, click_id); two clicks tie at ts=100 for user 1
    val clicks = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 50L, 3L), (2L, 10L, 4L))
      .toDF("user_id", "ts", "click_id")
    // purchases (user, ts, event_id)
    val buys = Seq((1L, 100L, 1000L), (1L, 60L, 1001L), (2L, 500L, 1002L),
      (3L, 77L, 1003L)).toDF("user_id", "ts", "event_id")
    (clicks, buys)
  }

  test("payload carry: latest at-or-before click wins, ties to largest payload") {
    val (clicks, buys) = fx
    val got = AsOfJoin.lastBeforeWith(clicks, buys, "user_id", "ts", "event_id", "click_id")
      .orderBy("event_id").collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString).orNull, Option(r.get(2)).map(_.toString).orNull)).toSeq
    assert(got === Seq(
      (1000L, "100", "9"), // tie at ts=100 → click 9 (largest payload)
      (1001L, "50", "3"),
      (1002L, "10", "4"),
      (1003L, null, null))) // user 3 has no clicks
  }

  test("null-payload click still wins attribution, ts and payload stay paired") {
    val sq = spark
    import sq.implicits._
    // user 1: click 3 at ts=10, then a LATER click at ts=50 whose id fails
    // the long cast (null payload). The ts=50 click must win (null ts+pay
    // pairing bug: two independent last() calls credited click 3 with ts=50)
    val clicks = Seq((1L, 10L, "3"), (1L, 50L, "x")).toDF("user_id", "ts", "click_id")
    val buys = Seq((1L, 60L, 1000L)).toDF("user_id", "ts", "event_id")
    val got = AsOfJoin.lastBeforeWith(clicks, buys, "user_id", "ts", "event_id", "click_id")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq
    assert(got === Seq((1000L, 50L, null)))
    // with a 15s tolerance the ts=50 winner is in-window → same pair; the
    // old unpaired form reported (50, 3) and wrongly credited the ts=10 click
    val tol = AsOfJoin.lastBeforeWith(clicks, buys, "user_id", "ts", "event_id",
        "click_id", toleranceSec = Some(15L))
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq
    assert(tol === Seq((1000L, 50L, null)))
  }

  test("tolerance nulls out attributions older than the window") {
    val (clicks, buys) = fx
    val got = AsOfJoin.lastBeforeWith(clicks, buys, "user_id", "ts", "event_id",
        "click_id", toleranceSec = Some(50L))
      .orderBy("event_id").collect().map(r => (r.getLong(0),
        Option(r.get(2)).map(_.toString).orNull)).toSeq
    assert(got === Seq(
      (1000L, "9"),  // click at 100, buy at 100: within 50s
      (1001L, "3"),  // click at 50, buy at 60: within 50s
      (1002L, null), // click at 10, buy at 500: outside the window
      (1003L, null)))
  }

  test("nearest: closest in either direction, ties to earlier, tolerance bounds") {
    val sq = spark; import sq.implicits._
    val l = Seq((1L, 10L), (1L, 100L), (1L, 200L), (2L, 5L))
      .toDF("user_id", "ts")
    val r = Seq(
      (1L, 40L, 900L),   // 30 after 10, 60 before 100 -> 10
      (1L, 160L, 901L),  // 60 after 100, 40 before 200 -> 200
      (1L, 150L, 902L),  // tie: 50 both ways -> earlier (100)
      (1L, 100L, 903L),  // exact hit -> 100
      (3L, 70L, 904L))   // no left rows -> null
      .toDF("user_id", "ts", "event_id")
    val got = AsOfJoin.nearest(l, r, "user_id", "ts", "event_id")
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got === Map(900L -> Some(10L), 901L -> Some(200L),
      902L -> Some(100L), 903L -> Some(100L), 904L -> None))
    // tolerance 35: 900 keeps its 30-away match, 901/902 lose theirs
    val tol = AsOfJoin.nearest(l, r, "user_id", "ts", "event_id",
        toleranceSec = Some(35L))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(tol === Map(900L -> Some(10L), 901L -> None,
      902L -> None, 903L -> Some(100L), 904L -> None))
  }
}
