package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `Column` is ColumnNode-backed and its Expression
  * constructors are `private[sql]`; extensions conventionally open a
  * sub-package of `org.apache.spark.sql` to reach the classic
  * conversion utilities (same approach as third-party connectors).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL-callable function backed by a raw Expression builder. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "builtin")

  /** Register a SQL table-valued function (FROM-clause callable) backed
    * by a LogicalPlan builder.
    */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Analyzed logical plan of a DataFrame (custom plan-node inputs). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame — the inverse
    * of `analyzed`, gated behind `private[sql]` upstream.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Natural ascending ordering over rows of the given column types —
    * the comparator SortMergeJoin uses for its streamed/buffered merge.
    */
  def naturalRowOrdering(dataTypes: Seq[org.apache.spark.sql.types.DataType])
      : Ordering[org.apache.spark.sql.catalyst.InternalRow] =
    org.apache.spark.sql.catalyst.expressions.RowOrdering
      .createNaturalAscendingOrdering(dataTypes)
}
