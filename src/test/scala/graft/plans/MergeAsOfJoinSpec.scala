package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The native merge as-of exec: equality with the window formulation on
  * random data, the SortMergeJoin-style plan shape, and edge cases. */
class MergeAsOfJoinSpec extends SparkSpec {

  test("random data: native exec equals the window operator exactly") {
    val sq = spark; import sq.implicits._
    val rnd = new scala.util.Random(21)
    val clicks = Seq.fill(4000)(
      (rnd.nextInt(50).toLong, rnd.nextInt(10000).toLong))
      .toDF("user_id", "ts")
    val buys = Seq.tabulate(1500)(i =>
      (rnd.nextInt(60).toLong, rnd.nextInt(10000).toLong, i.toLong))
      .toDF("user_id", "ts", "event_id")
    val win = AsOfJoin.lastBefore(clicks, buys, "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val native = AsOfJoin.mergeLastBefore(clicks, buys, "user_id", "ts")
      .select("event_id", "last_left_ts")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(native.size === 1500)
    assert(native === win)
  }

  test("plan: native exec with one exchange + sort per side, no window, no union") {
    val sq = spark; import sq.implicits._
    val l = Seq((1L, 10L), (1L, 20L)).toDF("k", "ts")
    val r = Seq((1L, 15L, 7L)).toDF("k", "ts", "id")
    val d = AsOfJoin.mergeLastBefore(l, r, "k", "ts")
    d.collect()
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("MergeAsOfJoin"), s"native exec missing:\n$p")
    assert(!p.contains("!MergeAsOfJoin"), s"missing-input marker on the exec:\n$p")
    assert(!p.contains("Window"), s"window crept back in:\n$p")
    assert(!p.contains("Union"), s"union crept back in:\n$p")
  }

  test("timestamps: TimestampType flows through as micros") {
    val sq = spark; import sq.implicits._
    val l = Seq((1L, "2024-01-01 00:00:10"), (1L, "2024-01-01 00:00:20"))
      .toDF("k", "s").select(col("k"), col("s").cast("timestamp").as("ts"))
    val r = Seq((1L, "2024-01-01 00:00:15", 1L), (1L, "2024-01-01 00:00:25", 2L))
      .toDF("k", "s", "id")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("id"))
    val got = AsOfJoin.mergeLastBefore(l, r, "k", "ts")
      .select(col("id"), col("last_left_ts").cast("string"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got(1L) === "2024-01-01 00:00:10")
    assert(got(2L) === "2024-01-01 00:00:20")
  }

  test("edges: equal ts inclusive, missing key null, empty left all null") {
    val sq = spark; import sq.implicits._
    val l = Seq((1L, 100L)).toDF("k", "ts")
    val r = Seq((1L, 100L, 1L), (2L, 500L, 2L)).toDF("k", "ts", "id")
    val got = AsOfJoin.mergeLastBefore(l, r, "k", "ts")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(3)) None else Some(x.getLong(3)))).toMap
    assert(got === Map(1L -> Some(100L), 2L -> None))
    val empty = AsOfJoin.mergeLastBefore(l.where(lit(false)), r, "k", "ts")
      .collect()
    assert(empty.length === 2 && empty.forall(_.isNullAt(3)))
  }
}
