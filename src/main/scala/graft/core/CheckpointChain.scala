package graft.core

import org.apache.spark.sql.DataFrame

/** Rolling localCheckpoint for iterative algorithms: each `next` truncates
  * the growing lineage and unpersists the PREVIOUS generation's blocks, so
  * cached state is bounded to one generation regardless of iteration
  * count (the connected-components / PageRank loop shape). Call
  * `release()` after the final result has been materialized. */
private[graft] class CheckpointChain(spark: org.apache.spark.sql.SparkSession) {
  private var prev: Option[org.apache.spark.rdd.RDD[_]] = None
  def next(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    val rdd = out.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    prev.foreach(_.unpersist(blocking = false))
    prev = rdd
    out
  }
  def release(): Unit = {
    prev.foreach(_.unpersist(blocking = false))
    prev = None
  }
}
