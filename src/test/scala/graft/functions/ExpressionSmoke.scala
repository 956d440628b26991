package graft.functions

import org.apache.spark.sql.SparkSession

/** Manual smoke for the native expressions at the SQL surface.
  * Run: sbt "Test/runMain graft.functions.ExpressionSmoke" */
object ExpressionSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.register(spark, "/root/testdata/sf0.001")

    // 1) SQL-surface use of graft_cosine; compare to HOF formulation
    val sql = spark.sql(
      """SELECT e.vec_id,
        |  graft_cosine(e.embedding, p.embedding) AS c_native,
        |  aggregate(zip_with(e.embedding, p.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
        |   / (sqrt(aggregate(e.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
        |    * sqrt(aggregate(p.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) AS c_hof
        |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        |WHERE e.vec_id BETWEEN 1 AND 200""".stripMargin)
    val rows = sql.collect()
    val exact = rows.count(r => r.getDouble(1) == r.getDouble(2))
    println(s"BITEQUAL=$exact/${rows.length}")

    // 2) plan shows whole-stage codegen around the expression
    val plan = sql.queryExecution.executedPlan.toString
    println("CODEGEN=" + plan.contains("*(1)"))

    // 3) simhash agg through SQL
    val sh = spark.sql(
      """SELECT doc_id, graft_simhash_agg(xxhash64(tok)) AS fp
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 3""".stripMargin).collect()
    println("SIMHASH_SQL=" + sh.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(","))

    // 4) misuse probe: wrong input type
    try {
      spark.sql("SELECT graft_cosine('a', 'b')").collect()
      println("MISUSE=no-error")
    } catch { case e: Throwable =>
      println("MISUSE=" + e.getClass.getSimpleName + ": " +
        e.getMessage.linesIterator.next().take(120))
    }
    spark.stop()
  }
}
