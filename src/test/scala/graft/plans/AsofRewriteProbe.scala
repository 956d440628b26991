package graft.plans

import org.apache.spark.sql.SparkSession

/** A/B probe for AsOfJoinRewrite: the same as-of SQL with the rule off
  * (theta join + max — O(clicks × purchases) per key) vs on (union +
  * running window — O(n log n)). Run manually:
  *   sbt "Test/runMain graft.plans.AsofRewriteProbe"
  */
object AsofRewriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ AsOfJoinRewrite

    // 50 users x 100k clicks, 200 purchases each: the theta join streams
    // ~500M pairs through the max partial agg; the window plan sorts
    // 5.01M rows once. The gap is quadratic-vs-linear, so it widens
    // without bound as either side grows.
    val users = 50
    spark.range(users.toLong * 100000).select(
      ($"id" % users).as("user_id"), ($"id" / users).as("ts"), $"id".as("click_id"))
      .createOrReplaceTempView("cc")
    spark.range(users.toLong * 200).select(
      ($"id" % users).as("user_id"), (($"id" / users) * 500 + 1).as("ts"), $"id".as("pid"))
      .createOrReplaceTempView("pp")

    val sql =
      """SELECT p.pid, max(named_struct('ts', c.ts, 'id', c.click_id)).id AS last_click
        |FROM pp p LEFT JOIN cc c ON p.user_id = c.user_id AND c.ts <= p.ts
        |GROUP BY p.pid""".stripMargin

    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def run(): Long = spark.sql(sql).selectExpr("sum(last_click)").as[Long].head()

    run() // warm naive
    val naive = time(run())
    spark.conf.set("spark.graft.asofJoin.rewrite", "true")
    val a = run()
    val rewritten = time(run())
    spark.conf.unset("spark.graft.asofJoin.rewrite")
    val b = run()
    require(a == b, s"rewrite changed the answer: $a vs $b")
    println(f"ASOF_NAIVE=$naive%.3f s  ASOF_REWRITTEN=$rewritten%.3f s  SPEEDUP=${naive / rewritten}%.1fx")
    spark.stop()
  }
}
