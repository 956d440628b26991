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

  /** [[next]] fused with the caller's per-round action (convergence
    * fingerprint, frontier count, dangling-mass scalar): the checkpoint is
    * LAZY, so the action's job both computes the round and persists the
    * generation's blocks — one Spark job per round instead of two
    * (materialize + act). The previous generation is released only AFTER
    * the action completes, because the lazy checkpoint still reads the
    * previous generation's blocks while materializing (unpersisting first
    * would force a recompute through truncated lineage and fail). */
  def nextWith[T](df: DataFrame)(action: DataFrame => T): (DataFrame, T) = {
    val out = df.localCheckpoint(eager = false)
    val rdd = out.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    val t = action(out)
    prev.foreach(_.unpersist(blocking = false))
    prev = rdd
    (out, t)
  }
  def release(): Unit = {
    prev.foreach(_.unpersist(blocking = false))
    prev = None
  }
}
