package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-line bridge every Spark extension library ships: constructing a
  * [[DataFrame]] from a custom [[LogicalPlan]] requires `Dataset.ofRows`,
  * which is `private[sql]` — so this forwarder lives in the
  * `org.apache.spark.sql` package. No other internal surface is touched. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
