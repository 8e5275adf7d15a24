package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions. Spark 4's
  * `Column` is connect-agnostic and the classic converters are
  * `private[sql]`, so extensions expose them from inside the sql package —
  * the standard pattern used by third-party Spark extension libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` for extension-built logical plans (commands
    * resolving a captured source plan at run time). `private[sql]` in
    * Spark 4's classic module, exposed here like the Column bridge.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The isStreaming-flagged DataFrame a V1 streaming `Source.getBatch`
    * must return (the FileStreamSource pattern): wraps an
    * already-planned batch query's InternalRow RDD. `private[sql]`.
    */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      batch: org.apache.spark.sql.DataFrame,
      isStreaming: Boolean): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(batch.queryExecution.toRdd, batch.schema,
        isStreaming)
}
