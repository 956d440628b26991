package graft.plans

import org.apache.spark.sql.SparkSession

/** A/B probe for GlobalWindowRewrite: the same ratio-to-total query with
  * the rule off (single-partition WindowExec buffering ALL rows on one
  * task) vs on (map-side partial aggregate + 1-row broadcast join). Run
  * manually:
  *   sbt "Test/runMain graft.plans.GlobalWindowRewriteProbe [rows]"
  */
object GlobalWindowRewriteProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ GlobalWindowRewrite

    spark.range(rows).select($"id", ($"id" % 9973).cast("double").as("v"))
      .createOrReplaceTempView("gw")
    val sql =
      "SELECT sum(v / tot) AS s FROM (SELECT v, sum(v) OVER () AS tot FROM gw) t"

    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def run(): Double = spark.sql(sql).as[Double].head()

    run() // warm
    val naive = time(run())
    spark.conf.set("spark.graft.rewrite.globalWindow", "true")
    val a = run()
    val rewritten = time(run())
    spark.conf.unset("spark.graft.rewrite.globalWindow")
    val b = run()
    println(f"rows=$rows naive=$naive%.2fs rewritten=$rewritten%.2fs " +
      f"speedup=${naive / rewritten}%.1fx agree=${math.abs(a - b) < 1e-6}")
  }
}
