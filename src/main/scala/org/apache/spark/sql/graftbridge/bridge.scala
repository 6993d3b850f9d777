package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression and DataFrame ↔ LogicalPlan bridges for the
  * Spark 4 API.
  *
  * Spark 4 Columns are ColumnNode-backed and the classic converters are
  * `private[sql]`; exposing them from inside `org.apache.spark.sql` is
  * the conventional pattern for Catalyst-extension libraries (the same
  * trick every open-source Spark expression library uses — there is no
  * public API for wrapping a custom Expression in a Column or a custom
  * LogicalPlan in a DataFrame yet).
  */
object SqlBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Eager Column → catalyst Expression conversion. `expression` wraps
    * the ColumnNode lazily (ColumnNodeExpression), which is fine inside
    * Spark's own operators but not serializable for closures of custom
    * physical operators; this converts through to real catalyst nodes
    * (e.g. a `.desc` Column becomes a catalyst SortOrder). */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzedPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a (possibly custom) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
