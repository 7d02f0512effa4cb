package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column⇄Expression converters — the
  * supported extension-point shims live behind `private[sql]` in Spark 4,
  * so library code registers custom Catalyst expressions through this
  * package-nested accessor (same technique Spark connectors use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
