package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the Spark 4 Column API.
  *
  * Spark 4 Columns are ColumnNode-backed and the classic converters are
  * `private[sql]`; exposing them from inside `org.apache.spark.sql` is
  * the conventional pattern for Catalyst-extension libraries (the same
  * trick every open-source Spark expression library uses — there is no
  * public API for wrapping a custom Expression in a Column yet).
  */
object SqlBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
