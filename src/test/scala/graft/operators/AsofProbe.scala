package graft.operators

import org.apache.spark.sql.SparkSession

object AsofProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.register(spark, "/root/testdata/sf0.1")

    val dsl = graft.dsl.Relational("JOIN-ASOF", spark)
    val plan = dsl.queryExecution.executedPlan.toString
    println("PLAN_HAS_WINDOW=" + plan.contains("RunningWindowFunction") + "/" + plan.contains("Window"))
    println("PLAN_HAS_NESTEDLOOP=" + plan.contains("NestedLoop"))

    def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val sql = graft.queries.Inventory.byId("JOIN-ASOF").sparkSql
    spark.sql(sql).collect(); dsl.collect() // warm
    val tSql = time(spark.sql(sql).collect())
    val tDsl = time(graft.dsl.Relational("JOIN-ASOF", spark).collect())
    println(f"ASOF_SQL_JOIN_MAX=$tSql%.3f s  ASOF_DSL_WINDOW=$tDsl%.3f s")
    spark.stop()
  }
}
