/* Bridge into Spark's `private[sql]` Column <-> Expression converters.
 * Spark 4.x made `Column` wrap a ColumnNode (Connect unification); the
 * classic converter lives at org.apache.spark.sql.classic.ExpressionUtils
 * with private[sql] Scala visibility, so a same-package shim is the
 * supported-jar way for a library to expose custom Catalyst Expressions
 * as Columns. */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
