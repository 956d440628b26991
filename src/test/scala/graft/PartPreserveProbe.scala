package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartPreserveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = (1 to 1000).map(i => (i.toLong, (i % 97).toLong)).toDF("a", "b")
      .repartition(col("b")).localCheckpoint()
    val labels = (1 to 97).map(i => (i.toLong, i.toLong)).toDF("node", "lbl")
      .groupBy("node").agg(min("lbl").as("lbl")).localCheckpoint()
    val joined = edges.join(labels.withColumnRenamed("node", "b"), "b")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"[probe] exchanges in co-partitioned join: $nEx")
    println(plan.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
