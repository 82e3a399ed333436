package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column constructor for native Catalyst
  * expressions (Spark 4 wraps Column around ColumnNode; the classic
  * converter lives behind package-private access). This is the standard
  * extension-library pattern for shipping custom expressions with a
  * DataFrame API — no Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom logical plan (Dataset.ofRows is
    * private[sql]; needed to expose custom operators like
    * `graft.plans.TopKPerGroupNode` through the DataFrame API). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
