package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` in Spark 4, so this one-file shim lives in the
  * `org.apache.spark.sql` package tree to re-export the two
  * conversions graft's custom Catalyst expressions need. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Dataset from a LogicalPlan (`Dataset.ofRows` is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Ship a Hadoop Configuration to executors
    * (`org.apache.spark.util.SerializableConfiguration` is
    * private[spark]); pair with [[hadoopConfOf]] on the task side. */
  def serializableHadoopConf(conf: org.apache.hadoop.conf.Configuration): java.io.Serializable =
    new org.apache.spark.util.SerializableConfiguration(conf)

  def hadoopConfOf(s: java.io.Serializable): org.apache.hadoop.conf.Configuration =
    s.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value
}
