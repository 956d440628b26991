package graft.plans

import org.apache.spark.sql.SparkSession

import graft.operators.AsOfJoin

/** A/B/C probe: the theta-join contract SQL vs the union+window operator
  * vs the native merge exec, on a 5M-click corpus. Run manually:
  *   sbt "Test/runMain graft.plans.MergeAsOfProbe [users]"
  */
object MergeAsOfProbe {
  def main(args: Array[String]): Unit = {
    val users = if (args.nonEmpty) args(0).toInt else 50
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val clicks = spark.range(users.toLong * 100000).select(
      ($"id" % users).as("user_id"), ($"id" / users).cast("long").as("ts"))
      .cache()
    val buys = spark.range(users.toLong * 200).select(
      ($"id" % users).as("user_id"), (($"id" / users) * 500 + 1).cast("long").as("ts"),
      $"id".as("event_id")).cache()
    clicks.count(); buys.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def sumCol(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.selectExpr(s"sum($c)").as[Long].head()

    def window() = sumCol(
      AsOfJoin.lastBefore(clicks, buys, "user_id", "ts", "event_id"),
      "last_left_ts")
    def native() = sumCol(
      AsOfJoin.mergeLastBefore(clicks, buys, "user_id", "ts"),
      "last_left_ts")
    window(); native() // warm
    val (tw, a) = time(window())
    val (tn, b) = time(native())
    println(f"users=$users clicks=${users * 100000} window=$tw%.2fs " +
      f"native=$tn%.2fs speedup=${tw / tn}%.1fx agree=${a == b}")
  }
}
